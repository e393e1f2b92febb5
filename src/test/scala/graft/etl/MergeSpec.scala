package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Merge policy scenarios from FIXTURES.md §A.3 / reference
  * 03_upsert_dw_pedidos.py:202-247. Uses a compact 4-column analog of the
  * fat table driven through the generic conditionalMerge, plus one
  * full-schema run through mergePedidos. */
class MergeSpec extends SparkSpec {
  import spark.implicits._
  import Merge._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val policies = Map[String, Policy](
    "evt" -> NewerEventWins, // stands for the 8 event columns
    "ins" -> Greatest, // data_insercao
    "txt" -> CoalesceKeepOld, // the 28 coalesce columns
    "event_ts" -> NewerEventWins)

  private def mk(rows: Seq[(String, Timestamp, Timestamp, String, String)]) =
    rows.toDF("k", "event_ts", "ins", "evt", "txt")

  private def merged(cur: Seq[(String, Timestamp, Timestamp, String, String)],
      upd: Seq[(String, Timestamp, Timestamp, String, String)]) =
    conditionalMerge(mk(cur), mk(upd), "k", "event_ts", policies)
      .collect().map(r => (r.getString(0),
        r.getTimestamp(1), r.getTimestamp(2), r.getString(3), r.getString(4)))
      .sortBy(_._1)

  test("new key inserts") {
    val out = merged(
      Seq(("a", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "old", "o")),
      Seq(("b", ts("2024-02-01 00:00:00"), ts("2024-02-01 00:00:00"), "new", "n")))
    assert(out.length == 2)
    assert(out(1) == (("b", ts("2024-02-01 00:00:00"), ts("2024-02-01 00:00:00"), "new", "n")))
  }

  test("newer event replaces event columns; older kept") {
    val cur = Seq(("a", ts("2024-02-01 00:00:00"), ts("2024-01-01 00:00:00"), "old", "o"))
    val newer = merged(cur,
      Seq(("a", ts("2024-03-01 00:00:00"), ts("2024-01-02 00:00:00"), "new", null)))
    assert(newer.head == (("a", ts("2024-03-01 00:00:00"), ts("2024-01-02 00:00:00"), "new", "o")))
    val older = merged(cur,
      Seq(("a", ts("2024-01-15 00:00:00"), ts("2024-01-02 00:00:00"), "new", "n")))
    // event cols keep OLD, GREATEST takes max, coalesce takes new non-null
    assert(older.head == (("a", ts("2024-02-01 00:00:00"), ts("2024-01-02 00:00:00"), "old", "n")))
  }

  test("NULL event-ts on either side keeps old event columns (3VL)") {
    val cur = Seq(("a", ts("2024-02-01 00:00:00"), ts("2024-01-01 00:00:00"), "old", "o"))
    val nullNew = merged(cur, Seq(("a", null, ts("2024-01-02 00:00:00"), "new", "n")))
    assert(nullNew.head._2 == ts("2024-02-01 00:00:00"))
    assert(nullNew.head._4 == "old")
    val curNull = Seq(("a", null.asInstanceOf[Timestamp], ts("2024-01-01 00:00:00"), "old", "o"))
    val bothWays = merged(curNull, Seq(("a", null, ts("2024-01-02 00:00:00"), "new", "n")))
    assert(bothWays.head._4 == "old")
  }

  test("GREATEST ignores nulls; coalesce keeps old when update null") {
    val out = merged(
      Seq(("a", ts("2024-02-01 00:00:00"), null.asInstanceOf[Timestamp], "old", "o")),
      Seq(("a", ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00"), "new", null)))
    assert(out.head._3 == ts("2024-01-05 00:00:00")) // greatest(null, x) = x
    assert(out.head._5 == "o") // coalesce(null, o)
  }

  test("mergePedidos over the full 41-column schema") {
    val key = "1" * 44
    def fatRow(evTs: Timestamp, valor: java.math.BigDecimal, origem: String) = {
      val vals = Schemas.fatSchema.fields.map { f =>
        f.name match {
          case "chave_nfe" => key
          case "data_ultima_ocr" => evTs
          case "valor_nfe" => valor
          case "arquivo_origem" => origem
          case "data_insercao" => ts("2024-01-01 00:00:00")
          case _ => null
        }
      }
      Row(vals.toIndexedSeq: _*)
    }
    val cur = spark.createDataFrame(
      java.util.List.of(fatRow(ts("2024-02-01 00:00:00"), new java.math.BigDecimal("10.00"), "old.csv")),
      Schemas.fatSchema)
    val upd = spark.createDataFrame(
      java.util.List.of(fatRow(ts("2024-03-01 00:00:00"), null, "new.csv")),
      Schemas.fatSchema)
    val out = Merge.mergePedidos(cur, upd).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Timestamp]("data_ultima_ocr") == ts("2024-03-01 00:00:00"))
    assert(r.getAs[String]("arquivo_origem") == "new.csv") // event col follows
    assert(r.getAs[java.math.BigDecimal]("valor_nfe").compareTo(new java.math.BigDecimal("10.00")) == 0) // coalesce kept old
  }

  test("merge idempotence: merging the same batch twice == once") {
    val cur = Seq(("a", ts("2024-02-01 00:00:00"), ts("2024-01-01 00:00:00"), "old", "o"))
    val upd = Seq(("a", ts("2024-03-01 00:00:00"), ts("2024-01-02 00:00:00"), "new", "n"),
      ("b", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "x", "y"))
    val once = conditionalMerge(mk(cur), mk(upd), "k", "event_ts", policies)
    val twice = conditionalMerge(once, mk(upd), "k", "event_ts", policies)
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }
}
