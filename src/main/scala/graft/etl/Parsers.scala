package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar parsing library: multi-format date/timestamp parsing, locale-aware
  * decimal parsing, and the gate/strip helpers of the typed projection.
  *
  * Semantics follow the `src` CTE of the reference's DW upsert
  * (/root/reference/python/03_upsert_dw_pedidos.py:22-171). Every helper is a
  * pure `Column` combinator (built-in functions only): the whole projection
  * stays inside Catalyst — constant-foldable, null-propagating, and
  * whole-stage-codegen'd. No UDFs, no custom Expressions needed.
  *
  * The regex chains are first-match-wins; branch ORDER is semantic (e.g.
  * "1.234" must hit the thousands-only branch before the strip-everything
  * fallback). Do not reorder.
  */
object Parsers {

  /** NULLIF(TRIM(x), '') — empty-after-trim becomes NULL
    * (03_upsert_dw_pedidos.py:24 and ~25 more columns). */
  def nullifTrim(c: Column): Column = {
    val t = trim(c)
    when(t === "", lit(null)).otherwise(t)
  }

  /** 44-digit NFe access-key gate (03_upsert_dw_pedidos.py:26-27): strip all
    * non-digits; keep iff exactly 44 digits remain, else NULL. */
  def nfeKey44(c: Column): Column = {
    val digits = regexp_replace(c, "\\D", "")
    when(length(digits) === 44, digits).otherwise(lit(null))
  }

  /** Strip non-digits then cast to int; "" → NULL
    * (qtd_volumes / cod_cd, 03_upsert_dw_pedidos.py:127-128). */
  def digitsToInt(c: Column): Column =
    nullif(regexp_replace(c, "\\D", ""), lit("")).try_cast("int")

  /** Identity-document normalizer (CNPJ/CPF): strip non-digits, trim,
    * empty→NULL (03_upsert_dw_pedidos.py:138,156). */
  def stripToDigits(c: Column): Column =
    nullif(trim(regexp_replace(c, "\\D", "")), lit(""))

  /** UF (state code) gate (03_upsert_dw_pedidos.py:151-152): drop
    * non-letters, uppercase; keep iff resulting length in [2,3]. */
  def ufGate(c: Column): Column = {
    val u = upper(regexp_replace(c, "[^A-Za-z]", ""))
    when(length(u).between(2, 3), u).otherwise(lit(null))
  }

  /** Zero-ish sentinels that mean "no date" (03_upsert_dw_pedidos.py:31). */
  private val dateSentinels =
    Seq("", "00/00/0000", "00/00/0000 00:00:00", "0000-00-00")

  private val reBrDateOptTime = "^\\d{2}/\\d{2}/\\d{4}( \\d{2}:\\d{2}:\\d{2})?$"
  private val reBrDateDash = "^\\d{2}-\\d{2}-\\d{4}$"
  private val reIsoDateOptTime =
    "^\\d{4}-\\d{2}-\\d{2}([ T]\\d{2}:\\d{2}(:\\d{2})?)?$"
  private val reCompact8 = "^\\d{8}$"

  /** Multi-format DATE parser (data_nfe / data_prev_entrega /
    * data_prev_entrega_original; 03_upsert_dw_pedidos.py:30-61).
    *
    * First-match-wins over: sentinel → NULL; `dd/MM/yyyy[ HH:mm:ss]`;
    * `dd-MM-yyyy`; ISO `yyyy-MM-dd[{ ,T}HH:mm[:ss]]`; compact `yyyyMMdd`;
    * else NULL. Time-of-day is irrelevant to the date result, so matched
    * datetime strings are truncated to their date prefix before parsing.
    *
    * Divergence note: where the reference's to_date would raise on a
    * calendar-invalid match (e.g. "31-02-2024"), this returns NULL — a
    * strictly more robust behavior for a load path that must never fail a
    * batch. All parsing goes through try_to_date/try_to_timestamp/try_cast
    * so the contract holds under Spark 4's default ANSI mode too.
    */
  def parseBrDate(c: Column): Column = {
    val t = trim(c)
    when(t.isin(dateSentinels: _*), lit(null))
      .when(t.rlike(reBrDateOptTime), try_to_date(substring(t, 1, 10), "dd/MM/yyyy"))
      .when(t.rlike(reBrDateDash), try_to_date(t, "dd-MM-yyyy"))
      .when(t.rlike(reIsoDateOptTime), try_to_date(substring(t, 1, 10), "yyyy-MM-dd"))
      .when(t.rlike(reCompact8), try_to_date(t, "yyyyMMdd"))
      .otherwise(lit(null))
  }

  private val reBrTsFull = "^\\d{2}/\\d{2}/\\d{4} \\d{2}:\\d{2}:\\d{2}$"
  private val reBrDateOnly = "^\\d{2}/\\d{2}/\\d{4}$"
  // ISO with optional seconds, fractional seconds and zone suffix
  // (03_upsert_dw_pedidos.py:67). The reference parses it with pattern
  // 'YYYY-MM-DD HH24:MI:SS', which in PostgreSQL silently IGNORES the
  // fractional/zone tail and defaults missing seconds to :00 — i.e. the
  // value is taken as a zoneless wall-clock truncated to whole seconds.
  private val reIsoTsLoose =
    "^\\d{4}-\\d{2}-\\d{2}[ T]\\d{2}:\\d{2}(:\\d{2})?(\\.\\d+)?(Z|[+-]\\d{2}:?\\d{2})?$"
  private val reIsoTsStrict = "^\\d{4}-\\d{2}-\\d{2}[ T]\\d{2}:\\d{2}(:\\d{2})?$"

  /** Extract `yyyy-MM-dd HH:mm:ss` from a loose ISO string, replicating the
    * reference's truncation semantics (fraction dropped, zone ignored,
    * missing seconds → :00). */
  private def isoWallClock(t: Column): Column = {
    val d = substring(t, 1, 10)
    val hm = substring(t, 12, 5)
    val ss = regexp_extract(t, "^.{16}:(\\d{2})", 1) // "" when absent
    try_to_timestamp(
      concat(d, lit(" "), hm, lit(":"), when(ss === "", "00").otherwise(ss)),
      lit("yyyy-MM-dd HH:mm:ss"))
  }

  /** Multi-format TIMESTAMP parser, loose variant (data_ultima_ocr;
    * 03_upsert_dw_pedidos.py:64-72): `dd/MM/yyyy HH:mm:ss`; loose ISO
    * (fraction/zone tolerated-and-ignored); bare `dd/MM/yyyy` → midnight;
    * else NULL. */
  def parseBrTimestamp(c: Column): Column = {
    val t = trim(c)
    when(t.rlike(reBrTsFull), try_to_timestamp(t, lit("dd/MM/yyyy HH:mm:ss")))
      .when(t.rlike(reIsoTsLoose), isoWallClock(t))
      .when(t.rlike(reBrDateOnly), try_to_timestamp(t, lit("dd/MM/yyyy")))
      .otherwise(lit(null))
  }

  /** Strict-ISO variant (chegada_transportadora;
    * 03_upsert_dw_pedidos.py:74-82): same as the loose parser but the ISO
    * branch accepts no fractional seconds or zone suffix. */
  def parseBrTimestampStrictIso(c: Column): Column = {
    val t = trim(c)
    when(t.rlike(reBrTsFull), try_to_timestamp(t, lit("dd/MM/yyyy HH:mm:ss")))
      .when(t.rlike(reIsoTsStrict), isoWallClock(t))
      .when(t.rlike(reBrDateOnly), try_to_timestamp(t, lit("dd/MM/yyyy")))
      .otherwise(lit(null))
  }

  /** Load-time stamp with default: unparseable `data_insercao` falls back to
    * now() (03_upsert_dw_pedidos.py:162-170). The reference accepts
    * `dd/MM/yyyy[ HH:mm:ss]` and ISO-with-optional-time here. */
  def parseDataInsercao(c: Column, defaultTs: Column = current_timestamp()): Column = {
    val t = trim(c)
    val parsed =
      when(t.rlike(reBrDateOptTime),
        try_to_timestamp(
          when(t.contains(" "), t).otherwise(concat(t, lit(" 00:00:00"))),
          lit("dd/MM/yyyy HH:mm:ss")))
        .when(t.rlike(reIsoDateOptTime),
          try_to_timestamp(rpad(regexp_replace(t, "T", " "), lit(19),
            // pad "yyyy-MM-dd" → +" 00:00:00", "…HH:mm" → +":00"
            when(length(t) === 10, " 00:00:00").otherwise(":00")),
            lit("yyyy-MM-dd HH:mm:ss")))
        .otherwise(lit(null))
    coalesce(parsed, defaultTs)
  }

  /** Locale-aware decimal parser (valor_nfe scale 2 / peso scale 3;
    * 03_upsert_dw_pedidos.py:88-125). Eight first-match-wins branches:
    *
    *  1. pt-BR grouped  `1.234,56`  → strip '.', ',' → '.'
    *  2. en-US grouped  `1,234.56`  → strip ','
    *  3. plain comma    `1234,5`    → ',' → '.'
    *  4. plain dot      `1234.5`    → as-is
    *  5. dot-thousands  `1.234`     → strip '.'
    *  6. comma-thousands`1,234`     → strip ','
    *  7. integer        `-12`       → as-is
    *  8. fallback: strip `[^0-9,.-]` then apply rule 1
    *
    * Fractional-digit limits follow the target scale (1-2 for scale 2,
    * 1-3 for scale 3), as in the reference's per-column regexes.
    */
  def parseLocalizedDecimal(c: Column, precision: Int, scale: Int): Column = {
    val dt = DecimalType(precision, scale)
    val t = trim(c)
    val f = s"1,$scale" // fraction-digit bound in the regexes
    val ptBr = s"^[+-]?\\d{1,3}(\\.\\d{3})+,\\d{$f}$$"
    val enUs = s"^[+-]?\\d{1,3}(,\\d{3})+\\.\\d{$f}$$"
    val plainComma = s"^[+-]?\\d+,\\d{$f}$$"
    val plainDot = s"^[+-]?\\d+\\.\\d{$f}$$"
    val dotThousands = "^[+-]?\\d{1,3}(\\.\\d{3})+$"
    val commaThousands = "^[+-]?\\d{1,3}(,\\d{3})+$"
    val integer = "^[+-]?\\d+$"
    def deGroupPtBr(x: Column): Column =
      regexp_replace(regexp_replace(x, "\\.", ""), ",", ".")
    // try_cast throughout: regex-valid values can still overflow the
    // precision, and the fallback branch is unvalidated — both must yield
    // NULL, not an ANSI exception
    when(c.isNull || t === "", lit(null).cast(dt))
      .when(t.rlike(ptBr), deGroupPtBr(t).try_cast(dt))
      .when(t.rlike(enUs), regexp_replace(t, ",", "").try_cast(dt))
      .when(t.rlike(plainComma), regexp_replace(t, ",", ".").try_cast(dt))
      .when(t.rlike(plainDot), t.try_cast(dt))
      .when(t.rlike(dotThousands), regexp_replace(t, "\\.", "").try_cast(dt))
      .when(t.rlike(commaThousands), regexp_replace(t, ",", "").try_cast(dt))
      .when(t.rlike(integer), t.try_cast(dt))
      .otherwise(deGroupPtBr(regexp_replace(c, "[^0-9,.-]", "")).try_cast(dt))
  }

  /** valor_nfe flavor: numeric(15,2) (03_upsert_dw_pedidos.py:88-105). */
  def parseValor(c: Column): Column = parseLocalizedDecimal(c, 15, 2)

  /** peso flavor: numeric(12,3) (03_upsert_dw_pedidos.py:108-125). */
  def parsePeso(c: Column): Column = parseLocalizedDecimal(c, 12, 3)

  /** Schema-driven string rendering for backfill (E-15;
    * /root/reference/sql/insert_publicpedidos_to_staging:23-38): timestamps →
    * `dd/MM/yyyy HH:mm:ss`, dates → `dd/MM/yyyy`, anything else → cast to
    * string. */
  def renderAsText(c: Column, dataType: org.apache.spark.sql.types.DataType): Column =
    dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        date_format(c, "dd/MM/yyyy HH:mm:ss")
      case org.apache.spark.sql.types.DateType => date_format(c, "dd/MM/yyyy")
      case _ => c.cast("string")
    }
}
