package graft.etl

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based guards (SURVEY §5.3): parse∘render round-trips over
  * generated values, decimal invariance under locale re-rendering, and the
  * algebraic laws of the conditional merge (idempotence; input-order
  * insensitivity given the deterministic dedup order).
  *
  * Uses raw scalacheck Gens sampled with fixed seeds (the scalatest⇄
  * scalacheck bridge artifact isn't available offline). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = Gen.Parameters.default
  private def sample[T](g: Gen[T], n: Int, seed0: Long = 42L): Seq[T] =
    (0 until n).flatMap(i => g.apply(params, Seed(seed0 + i)))

  private val genDate: Gen[java.time.LocalDate] = for {
    y <- Gen.choose(1990, 2035)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
  } yield java.time.LocalDate.of(y, m, d)

  private def parseMany(inputs: Seq[String],
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Any] =
    inputs.toDF("x").select(f(col("x"))).collect().map(_.get(0)).toSeq

  test("parseBrDate ∘ render = id for all four render formats (200 gen dates)") {
    val dates = sample(genDate, 200)
    val fmts = Seq("dd/MM/yyyy", "dd-MM-yyyy", "yyyy-MM-dd", "yyyyMMdd")
      .map(java.time.format.DateTimeFormatter.ofPattern)
    fmts.foreach { fmt =>
      val rendered = dates.map(fmt.format)
      val parsed = parseMany(rendered, Parsers.parseBrDate)
      assert(parsed.map(_.toString) == dates.map(_.toString), s"fmt=$fmt")
    }
  }

  test("parseBrTimestamp ∘ render = id on generated wall-clock instants") {
    val genTs = for {
      d <- genDate
      h <- Gen.choose(0, 23); mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
    } yield java.time.LocalDateTime.of(d, java.time.LocalTime.of(h, mi, s))
    val instants = sample(genTs, 200)
    val br = java.time.format.DateTimeFormatter.ofPattern("dd/MM/yyyy HH:mm:ss")
    val iso = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
    Seq(br -> Parsers.parseBrTimestamp _, iso -> Parsers.parseBrTimestamp _,
      iso -> Parsers.parseBrTimestampStrictIso _).foreach { case (fmt, parser) =>
      val rendered = instants.map(fmt.format)
      val parsed = parseMany(rendered, parser)
      assert(parsed.map(_.asInstanceOf[Timestamp].toLocalDateTime) == instants, s"fmt=$fmt")
    }
  }

  test("parseLocalizedDecimal invariant across four locale renderings (300 gen values)") {
    val cents = sample(Gen.choose(0L, 999999999999L), 300)
    def grouped(n: Long, sep: String): String =
      n.toString.reverse.grouped(3).mkString(sep.reverse).reverse
    val expected = cents.map(c => BigDecimal(c, 2).toString)
    val renderings = Seq(
      cents.map(c => grouped(c / 100, ".") + "," + f"${c % 100}%02d"),
      cents.map(c => grouped(c / 100, ",") + "." + f"${c % 100}%02d"),
      cents.map(c => s"${c / 100},${f"${c % 100}%02d"}"),
      cents.map(c => s"${c / 100}.${f"${c % 100}%02d"}"))
    renderings.foreach { rendered =>
      val parsed = parseMany(rendered, Parsers.parseValor)
      assert(
        parsed.map(v => BigDecimal(v.asInstanceOf[java.math.BigDecimal]).toString) == expected,
        s"first=${rendered.head}")
    }
  }

  private def ts(epochMin: Long) = new Timestamp(epochMin * 60000)

  private val policies = Map[String, Merge.Policy](
    "event_ts" -> Merge.NewerEventWins,
    "evt" -> Merge.NewerEventWins,
    "ins" -> Merge.Greatest,
    "txt" -> Merge.CoalesceKeepOld)

  private val genRow: Gen[(String, Option[Long], Long, String, Option[String])] = for {
    k <- Gen.oneOf("k1", "k2", "k3", "k4")
    evTs <- Gen.option(Gen.choose(0L, 1000L))
    ins <- Gen.choose(0L, 1000L)
    evt <- Gen.identifier.map(_.take(4))
    txt <- Gen.option(Gen.identifier.map(_.take(4)))
  } yield (k, evTs, ins, evt, txt)

  private def mkDf(rows: Seq[(String, Option[Long], Long, String, Option[String])]) =
    rows.map { case (k, e, i, v, t2) => (k, e.map(ts).orNull, ts(i), v, t2.orNull) }
      .toDF("k", "event_ts", "ins", "evt", "txt")

  private def dedup(rows: Seq[(String, Option[Long], Long, String, Option[String])]) =
    Dedup.latestPerKey(mkDf(rows), Seq("k"),
      Seq(col("event_ts").desc_nulls_last, col("ins").desc_nulls_last,
        col("evt").desc, col("txt").desc_nulls_last))

  test("merge idempotence and batch-order insensitivity (8 generated scenarios)") {
    (0 until 8).foreach { trial =>
      val curRows = sample(genRow, 12, 1000L * trial)
      val updRows = sample(genRow, 12, 2000L * trial + 7)
      val cur = dedup(curRows)
      val upd = dedup(updRows)
      val once = Merge.conditionalMerge(cur, upd, "k", "event_ts", policies)
      // idempotence: applying the same update batch twice changes nothing
      val twice = Merge.conditionalMerge(once, upd, "k", "event_ts", policies)
      assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq,
        s"trial=$trial idempotence")
      // shuffled update input yields identical state (dedup order is total)
      val updShuffled = dedup(new scala.util.Random(trial).shuffle(updRows))
      val once2 = Merge.conditionalMerge(cur, updShuffled, "k", "event_ts", policies)
      assert(once.orderBy("k").collect().toSeq == once2.orderBy("k").collect().toSeq,
        s"trial=$trial order-insensitivity")
    }
  }
}
