package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed conditional merge — the reference's crown-jewel operator:
  * `INSERT … ON CONFLICT (chave_nfe) DO UPDATE` with three per-column
  * policies (/root/reference/python/03_upsert_dw_pedidos.py:202-247).
  *
  * Spark-first design: a join-based merge. The update side is already
  * deduped to one row per key (Dedup.latestPedido — required for ON CONFLICT
  * too), so `dw FULL OUTER JOIN updates ON key` + a per-column resolve
  * projection reproduces insert/update/keep in one declarative plan:
  *
  *  - key only in updates → insert (all update columns)
  *  - key only in dw      → keep row unchanged
  *  - both                → per-column policy
  *
  * Policies (column lists mirror :204-246):
  *  - NewerEventWins: replaced only when `upd.data_ultima_ocr >
  *    old.data_ultima_ocr` under default three-valued logic — when either
  *    side's event time is NULL the comparison is not-true and the OLD value
  *    is kept, exactly PostgreSQL's NULL-safe-false `>` (:204-214).
  *  - Greatest: `GREATEST(old, new)` (:216). Postgres GREATEST ignores NULLs;
  *    Spark's `greatest` does too.
  *  - CoalesceKeepOld: `COALESCE(new, old)` (:217-246).
  *
  * Scale notes: plan is scan+scan → Exchange(key) → SortMergeJoin → Project.
  * One shuffle each side, no driver materialization. For repeated merges at
  * 100 TB, persist the DW table bucketed by the key (`bucketBy(n, key)`) so
  * the DW side's exchange disappears and only the (small) update batch
  * shuffles — BucketedMergeSpec demonstrates that plan (bucketed scan feeds
  * the join, zero DW-side exchanges). AQE handles skew; the key is
  * high-cardinality so none expected.
  */
object Merge {

  sealed trait Policy
  /** Take the update's value only when the update's event-ts is newer. */
  case object NewerEventWins extends Policy
  /** max(old, new), NULL-tolerant. */
  case object Greatest extends Policy
  /** Update value unless NULL, else keep old. */
  case object CoalesceKeepOld extends Policy
  /** On conflict the old value always stands (column absent from the
    * reference's SET list — insert-only). */
  case object KeepOld extends Policy

  /** Event-versioned columns (03_upsert_dw_pedidos.py:204-214). */
  val newerEventCols: Seq[String] = Seq(
    "data_ultima_ocr", "data_prev_entrega", "status_prazo", "id_ult_ocr",
    "ultima_ocorrencia", "chave_ult_ocr", "chegada_transportadora",
    "arquivo_origem")

  /** GREATEST columns (:216). */
  val greatestCols: Seq[String] = Seq("data_insercao")

  /** Columns the reference's ON CONFLICT SET list never touches
    * (03_upsert_dw_pedidos.py:202-246 lists 38 of the 40 non-key columns;
    * these two are absent) — on conflict the stored value stands. */
  val keepOldCols: Seq[String] = Seq("data_nfe", "data_prev_entrega_original")

  /** The reference's full policy map over the fat schema (key excluded). */
  def pedidoPolicies: Map[String, Policy] = {
    val all = Schemas.fatSchema.fieldNames.toSeq.filterNot(_ == "chave_nfe")
    all.map { c =>
      c -> (if (newerEventCols.contains(c)) NewerEventWins
      else if (greatestCols.contains(c)) Greatest
      else if (keepOldCols.contains(c)) KeepOld
      else CoalesceKeepOld)
    }.toMap
  }

  /** Generic conditional merge of `updates` into `current` on `key`.
    *
    * @param eventTs    column name whose recency guards NewerEventWins
    * @param policies   per-column policy for every non-key column
    */
  def conditionalMerge(
      current: DataFrame,
      updates: DataFrame,
      key: String,
      eventTs: String,
      policies: Map[String, Policy]): DataFrame = {
    val cur = current.alias("cur")
    val upd = updates.alias("upd")
    val joined = cur.join(upd, col(s"cur.$key") === col(s"upd.$key"), "full_outer")

    val matched = col(s"cur.$key").isNotNull && col(s"upd.$key").isNotNull
    val insertOnly = col(s"cur.$key").isNull
    val newer = col(s"upd.$eventTs") > col(s"cur.$eventTs") // 3VL: NULL ⇒ keep old

    def resolve(c: String): Column = {
      val o = col(s"cur.$c"); val n = col(s"upd.$c")
      val onMatch = policies(c) match {
        case NewerEventWins => when(newer, n).otherwise(o)
        case Greatest => greatest(o, n)
        case CoalesceKeepOld => coalesce(n, o)
        case KeepOld => o
      }
      when(insertOnly, n).when(matched, onMatch).otherwise(o).as(c)
    }

    val keyCol = coalesce(col(s"upd.$key"), col(s"cur.$key")).as(key)
    val outCols = current.columns.map(c => if (c == key) keyCol else resolve(c))
    joined.select(outCols.toSeq: _*)
  }

  /** The reference merge, fully configured (03_upsert_dw_pedidos.py:202-247). */
  def mergePedidos(dw: DataFrame, updates: DataFrame): DataFrame =
    conditionalMerge(dw, updates, "chave_nfe", "data_ultima_ocr", pedidoPolicies)
}
