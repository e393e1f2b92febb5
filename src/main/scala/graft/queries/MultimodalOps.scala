package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import Util._

/** Multimodal-column plumbing: treat media as opaque `binary` payloads with
  * typed metadata, keeping schema/partitioning/batching real while the
  * actual codec is stubbed (no image/audio libraries in this environment).
  *
  * `multimodal_meta` is the oracle-checked query: payload = UTF-8 bytes of
  * the document text standing in for media bytes; metadata = byte length,
  * sha256, and deterministic fake decode dimensions derived from the hash.
  *
  * [[decodeStub]] is the library surface a real decoder would replace: a
  * typed `mapPartitions` over (id, payload) batches — the Scala analog of a
  * pandas-UDF `mapInPandas` decode — returning per-item features. Partition
  * shape, schema, and batching are real; only the codec body is fake.
  */
object MultimodalOps {

  /** Hex digit value of position `p` (1-based) of a hex string column. */
  private def hexAt(c: org.apache.spark.sql.Column, p: Int) =
    instr(lit("0123456789abcdef"), substring(c, p, 1)) - 1

  /** Opaque binary payload + typed metadata, all from built-ins. */
  private def multimodalMeta(s: SparkSession, dir: String): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    val h = sha2(payload, 256)
    t(s, dir, "documents").select(
      col("doc_id"),
      length(payload).as("n_bytes"),
      h.as("sha256"),
      // deterministic fake "decoded" dimensions from the content hash
      (hexAt(h, 1) * 16 + hexAt(h, 2) + 64).cast("int").as("width"),
      (hexAt(h, 3) * 16 + hexAt(h, 4) + 64).cast("int").as("height"),
      // try_cast: a catalog with a non-numeric source suffix must yield a
      // NULL index, not kill the scan (ANSI CAST_INVALID_INPUT — found by
      // the differential fuzz gate; TRY_CAST mirrors it in the oracle)
      substring(col("source"), 4, 10).try_cast("int").as("source_idx"))
      .orderBy("doc_id")
  }

  private val multimodalMetaSql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  sha256(text) AS sha256,
      |  CAST((strpos('0123456789abcdef', substr(sha256(text),1,1))-1)*16
      |     + (strpos('0123456789abcdef', substr(sha256(text),2,1))-1) + 64 AS INT) AS width,
      |  CAST((strpos('0123456789abcdef', substr(sha256(text),3,1))-1)*16
      |     + (strpos('0123456789abcdef', substr(sha256(text),4,1))-1) + 64 AS INT) AS height,
      |  TRY_CAST(substr(source, 4, 10) AS INT) AS source_idx
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Exact payload dedup — the FIRST dedup tier of a media pipeline
    * (before any perceptual hash): identical byte payloads collapse by
    * content hash, reporting each duplicate family's canonical copy
    * (lowest id — the dedup_exact rule) and the storage the collapse
    * reclaims (0 for singleton families — every payload gets a row, the
    * dedup_exact grain, so the report is also the content-hash index a
    * dedup-on-write sink probes). On a 100 TB media corpus this is one
    * map-side-combining hash aggregate over (sha256, bytes) — the
    * payload bytes themselves never shuffle, only their 32-byte digests;
    * NULL payloads are excluded (no bytes ⇒ nothing to dedup, and
    * NULL ≠ NULL). */
  private def mediaExactDedup(s: SparkSession, dir: String): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    t(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), sha2(payload, 256).as("sha256"),
        length(payload).cast("long").as("nb"))
      .groupBy("sha256").agg(
        count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("canonical_id"),
        max(col("nb")).as("n_bytes"))
      .withColumn("bytes_saved", (col("n_copies") - 1) * col("n_bytes"))
      .orderBy("sha256")
  }

  private val mediaExactDedupSql =
    """SELECT sha256, CAST(COUNT(*) AS BIGINT) AS n_copies,
      |  MIN(doc_id) AS canonical_id,
      |  CAST(MAX(nb) AS BIGINT) AS n_bytes,
      |  CAST((COUNT(*) - 1) * MAX(nb) AS BIGINT) AS bytes_saved
      |FROM (SELECT doc_id, sha256(text) AS sha256,
      |        octet_length(encode(text)) AS nb
      |      FROM documents WHERE text IS NOT NULL)
      |GROUP BY sha256 ORDER BY sha256""".stripMargin

  /** One decoded media item (what a real image decoder would emit). */
  case class MediaFeatures(id: Long, width: Int, height: Int, channels: Int,
      meanByte: Double, nBytes: Long)

  /** STUB decode: a real implementation would decode image/audio bytes per
    * partition (batched, library handle reused across the partition — the
    * pattern that matters at scale). The fake derives deterministic features
    * from the bytes themselves. */
  def decodeStub(items: Dataset[(Long, Array[Byte])]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition "codec" initialization would go here
      it.map { case (id, bytes) =>
        val mean =
          if (bytes.isEmpty) 0.0
          else bytes.map(b => (b & 0xff).toLong).sum.toDouble / bytes.length
        MediaFeatures(id,
          width = 64 + (math.abs(java.util.Arrays.hashCode(bytes)) % 256),
          height = 64 + (math.abs(java.util.Arrays.hashCode(bytes)) / 256 % 256),
          channels = 3, meanByte = mean, nBytes = bytes.length.toLong)
      }
    }
  }

  /** Frame sampling over an opaque payload: the payload is treated as a
    * sequence of fixed 256-byte frames and every 4th frame is selected and
    * fingerprinted — the Spark-side shape of video frame-sampling (explode
    * of a per-item frame index sequence → narrow per-frame projection; at
    * scale the explode is the only row-multiplying step and carries index +
    * reference, never copied payloads per frame).
    *
    * The corpus payload is ASCII text, so frames are sliced with substring
    * in both engines (a real codec would slice `binary`; [[decodeStub]]
    * shows that path). */
  private def mediaFrameSample(s: SparkSession, dir: String): DataFrame = {
    val frameLen = 256
    val step = 4
    t(s, dir, "documents")
      .withColumn("nf",
        greatest(ceil(length(col("text")) / lit(frameLen.toDouble)).cast("long"), lit(1L)))
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("nf") - 1, lit(step.toLong))))
      .withColumn("frame", expr(s"substring(text, frame_idx * $frameLen + 1, $frameLen)"))
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).as("frame_len"),
        md5(col("frame")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")
  }

  private val mediaFrameSampleSql =
    """SELECT doc_id, fi AS frame_idx,
      |  CAST(length(substr(text, CAST(fi*256+1 AS INT), 256)) AS INT) AS frame_len,
      |  md5(substr(text, CAST(fi*256+1 AS INT), 256)) AS frame_md5
      |FROM (SELECT doc_id, text,
      |        greatest(CAST(ceil(length(text)/256.0) AS BIGINT), 1) AS nf
      |      FROM documents), UNNEST(range(0, nf, 4)) t(fi)
      |ORDER BY doc_id, frame_idx""".stripMargin

  val all: Seq[Q] = Seq(
    Q("multimodal_meta", multimodalMeta, Some(multimodalMetaSql)),
    Q("media_exact_dedup", mediaExactDedup, Some(mediaExactDedupSql)),
    Q("media_frame_sample", mediaFrameSample, Some(mediaFrameSampleSql)))
}
