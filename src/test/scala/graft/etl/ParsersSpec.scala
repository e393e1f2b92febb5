package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Literal cases lifted from the reference's regex chains
  * (/root/reference/python/03_upsert_dw_pedidos.py). */
class ParsersSpec extends SparkSpec {
  import spark.implicits._

  private def run1(input: String, f: Column => Column): Any = {
    val rows = Seq(Option(input)).toDF("x").select(f(col("x")).as("y")).collect()
    rows.head.get(0)
  }
  private def str(input: String, f: Column => Column): String =
    Option(run1(input, f)).map(_.toString).orNull

  test("nullifTrim: trims; empty → null (ref :24)") {
    assert(str("  abc  ", Parsers.nullifTrim) == "abc")
    assert(str("   ", Parsers.nullifTrim) == null)
    assert(str("", Parsers.nullifTrim) == null)
  }

  test("nfeKey44: exactly 44 digits after strip (ref :26-27)") {
    val k44 = "1" * 44
    assert(str(k44, Parsers.nfeKey44) == k44)
    assert(str("35 2409 " + "1" * 38, Parsers.nfeKey44) == ("352409" + "1" * 38))
    assert(str("1" * 43, Parsers.nfeKey44) == null)
    assert(str("1" * 45, Parsers.nfeKey44) == null)
    assert(str("", Parsers.nfeKey44) == null)
  }

  test("digitsToInt (ref :127-128)") {
    assert(run1("3", Parsers.digitsToInt) == 3)
    assert(run1("3 vol", Parsers.digitsToInt) == 3)
    assert(run1("", Parsers.digitsToInt) == null)
    assert(run1("abc", Parsers.digitsToInt) == null)
  }

  test("stripToDigits CNPJ/CPF (ref :138,156)") {
    assert(str("12.345.678/0001-90", Parsers.stripToDigits) == "12345678000190")
    assert(str("--", Parsers.stripToDigits) == null)
  }

  test("ufGate (ref :151-152)") {
    assert(str("SP", Parsers.ufGate) == "SP")
    assert(str(" sp ", Parsers.ufGate) == "SP")
    assert(str("S1P", Parsers.ufGate) == "SP")
    assert(str("SAOPAULO", Parsers.ufGate) == null)
    assert(str("S", Parsers.ufGate) == null)
  }

  test("parseBrDate formats (ref :30-39)") {
    assert(str("31/12/2024", Parsers.parseBrDate) == "2024-12-31")
    assert(str("31/12/2024 23:59:59", Parsers.parseBrDate) == "2024-12-31")
    assert(str("31-12-2024", Parsers.parseBrDate) == "2024-12-31")
    assert(str("2024-12-31", Parsers.parseBrDate) == "2024-12-31")
    assert(str("2024-12-31T23:59", Parsers.parseBrDate) == "2024-12-31")
    assert(str("2024-12-31 23:59:59", Parsers.parseBrDate) == "2024-12-31")
    assert(str("20241231", Parsers.parseBrDate) == "2024-12-31")
  }

  test("parseBrDate sentinels and garbage → null (ref :31,38)") {
    Seq("", "00/00/0000", "00/00/0000 00:00:00", "0000-00-00", "garbage",
      "31/13/2024x").foreach(s => assert(str(s, Parsers.parseBrDate) == null, s))
  }

  test("parseBrTimestamp loose ISO (ref :64-72)") {
    assert(str("31/12/2024 23:59:59", Parsers.parseBrTimestamp) == "2024-12-31 23:59:59.0")
    assert(str("2024-12-31T23:59:59.123Z", Parsers.parseBrTimestamp) == "2024-12-31 23:59:59.0")
    assert(str("2024-12-31 23:59+03:00", Parsers.parseBrTimestamp) == "2024-12-31 23:59:00.0")
    assert(str("2024-12-31T23:59", Parsers.parseBrTimestamp) == "2024-12-31 23:59:00.0")
    assert(str("31/12/2024", Parsers.parseBrTimestamp) == "2024-12-31 00:00:00.0")
    assert(str("gar bage", Parsers.parseBrTimestamp) == null)
  }

  test("parseBrTimestampStrictIso rejects zone/fraction (ref :74-82)") {
    assert(str("2024-12-31T23:59", Parsers.parseBrTimestampStrictIso) == "2024-12-31 23:59:00.0")
    assert(str("2024-12-31 23:59:58", Parsers.parseBrTimestampStrictIso) == "2024-12-31 23:59:58.0")
    assert(str("2024-12-31T23:59:59.123Z", Parsers.parseBrTimestampStrictIso) == null)
    assert(str("31/12/2024 01:02:03", Parsers.parseBrTimestampStrictIso) == "2024-12-31 01:02:03.0")
  }

  test("parseValor: 8-branch locale decimal (ref :88-105)") {
    assert(str("1.234,56", Parsers.parseValor) == "1234.56")
    assert(str("1,234.56", Parsers.parseValor) == "1234.56")
    assert(str("1234,5", Parsers.parseValor) == "1234.50")
    assert(str("1234.5", Parsers.parseValor) == "1234.50")
    assert(str("1.234", Parsers.parseValor) == "1234.00") // thousands, NOT 1.23
    assert(str("1,234", Parsers.parseValor) == "1234.00")
    assert(str("-12", Parsers.parseValor) == "-12.00")
    assert(str("R$ 1.234,56", Parsers.parseValor) == "1234.56") // fallback strip
    assert(str("", Parsers.parseValor) == null)
    assert(str("1.234.567,89", Parsers.parseValor) == "1234567.89")
  }

  test("parsePeso: scale-3 variant (ref :108-125)") {
    assert(str("1.234,567", Parsers.parsePeso) == "1234.567")
    assert(str("12,3", Parsers.parsePeso) == "12.300")
    // scale-3 plain-dot branch matches BEFORE dot-thousands (ref :116-118),
    // so "12.345" is 12.345 for peso — unlike valor where it's 1234-style
    assert(str("12.345", Parsers.parsePeso) == "12.345")
    assert(str("0,5 kg", Parsers.parsePeso) == "0.500") // fallback strip
  }

  test("parseDataInsercao: default on unparseable (ref :162-170)") {
    import org.apache.spark.sql.functions.lit
    val dflt = org.apache.spark.sql.functions.to_timestamp(lit("2020-01-01 00:00:00"))
    assert(str("05/06/2024 10:11:12",
      c => Parsers.parseDataInsercao(c, dflt)) == "2024-06-05 10:11:12.0")
    assert(str("2024-06-05T10:11",
      c => Parsers.parseDataInsercao(c, dflt)) == "2024-06-05 10:11:00.0")
    assert(str("2024-06-05",
      c => Parsers.parseDataInsercao(c, dflt)) == "2024-06-05 00:00:00.0")
    assert(str("not a date",
      c => Parsers.parseDataInsercao(c, dflt)) == "2020-01-01 00:00:00.0")
  }
}
