package graft.etl

import java.nio.charset.{Charset, CodingErrorAction}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Robust CSV → staging load: dialect sniffing, header validation, header
  * mapping, fixed-order projection, lineage column.
  *
  * Re-expression of /root/reference/python/02_load_stage_pedidos.py:
  *  - encoding trial over [cp1252, latin-1, utf-8-sig, utf-8] (:128-139)
  *  - separator by frequency over the first 201 lines (:115-124)
  *  - header trim + BOM strip (:145,172)
  *  - accept iff ≥10 headers are known (:163-167)
  *  - rename via DE_PARA, fill missing canonical cols with "", project to
  *    the fixed column order (:169-177)
  *  - per-row lineage column arquivo_origem = basename (:184)
  *
  * Division of labor (SURVEY §2 O-4): dialect detection is a driver-side
  * probe of the file head — Spark's CSV reader takes encoding/sep as fixed
  * options and does not sniff — while parsing/projection run distributed.
  */
object StageLoad {

  case class Dialect(encoding: String, sep: String)

  val candidateSeps = Seq(",", ";", "|", "\t")
  /** Strict-decode trial order. The reference lists [cp1252, latin-1,
    * utf-8-sig, utf-8] (:128) but opens with errors="replace", so its trial
    * can never fail and cp1252 always wins — mojibake for UTF-8 input. We
    * instead try UTF-8 first under STRICT decoding: UTF-8 is self-validating
    * (accented cp1252 bytes are invalid UTF-8 sequences), so each real
    * encoding lands on itself — a deliberate robustness improvement. */
  val candidateEncodings = Seq("UTF-8", "windows-1252", "ISO-8859-1")
  /** Lines inspected by the separator-frequency probe (ref :120-121). */
  val sniffWindow = 201

  /** Pick the separator with the highest total occurrence count in the first
    * `sniffWindow` lines (ref :115-124; ties resolve in candidate order,
    * matching Python's max-over-dict-iteration-order). */
  def detectSep(lines: Seq[String]): String = {
    val counts = candidateSeps.map(s => s -> lines.iterator.map(_.count(_ == s.head)).sum)
    counts.maxBy(_._2)._1
  }

  /** Decode strictly, failing on malformed bytes — the trial-order semantics
    * of the reference's encoding loop (:128-139). UTF-8-sig is folded into
    * UTF-8 + BOM strip (the header normalizer drops the BOM either way). */
  private def tryDecode(bytes: Array[Byte], charset: String): Option[String] = Try {
    val dec = Charset.forName(charset).newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
  }.toOption

  /** Driver-side dialect sniff of one file's head. */
  def sniffDialect(path: Path): Dialect = {
    val head = {
      val in = Files.newInputStream(path)
      val raw = try in.readNBytes(1 << 20) finally in.close() // 1 MiB ≫ 201 lines
      // A truncated read can split a multi-byte UTF-8 sequence at the
      // boundary, which would fail the strict UTF-8 trial and silently
      // mojibake a valid UTF-8 file via the cp1252 fallback — drop any
      // dangling partial sequence (≤ 3 continuation bytes) before judging.
      if (raw.length < (1 << 20)) raw
      else {
        var end = raw.length
        while (end > raw.length - 4 && (raw(end - 1) & 0xc0) == 0x80) end -= 1
        if (end > 0 && (raw(end - 1) & 0x80) != 0) end -= 1 // the lead byte
        java.util.Arrays.copyOf(raw, end)
      }
    }
    val (enc, text) = candidateEncodings.iterator
      .flatMap(e => tryDecode(head, e).map(e -> _))
      .nextOption()
      .getOrElse("ISO-8859-1" -> new String(head, "ISO-8859-1")) // never fails
    Dialect(enc, detectSep(text.linesIterator.take(sniffWindow).toSeq))
  }

  /** Normalize one header cell: trim + BOM strip (ref :145). */
  def normHeader(h: String): String = h.trim.replace("﻿", "")

  /** File-accept gate: ≥ minValidHeaders known headers (ref :163-167). */
  def headerValido(columns: Seq[String]): Boolean =
    columns.count(c => Schemas.dePara.contains(normHeader(c))) >= Schemas.minValidHeaders

  /** Spark 4 restricts CSV charsets to this native set unless
    * `spark.sql.legacy.javaCharsets` is on (SPARK-46841). The sniffer's
    * candidate list includes windows-1252 — the reference's PRIMARY
    * encoding for these reports — so the readers below enable the conf on
    * demand; without it every cp1252 file throws at analysis and the
    * quarantine router silently eats the load. */
  private val nativeCsvCharsets = Set(
    "iso-8859-1", "us-ascii", "utf-16", "utf-16be", "utf-16le", "utf-32", "utf-8")
  private def ensureCharsetReadable(spark: SparkSession, encoding: String): Unit =
    if (!nativeCsvCharsets(encoding.toLowerCase(java.util.Locale.ROOT)))
      spark.conf.set("spark.sql.legacy.javaCharsets", "true")

  /** Read one CSV with sniffed dialect into an all-string DataFrame.
    * PERMISSIVE mode: ragged short rows → null-padded; Spark's univocity
    * parser handles quotes/escapes like the reference's csv.reader
    * (quotechar '"', doublequote, escapechar '\\'; ref :133-136). */
  def readCsv(spark: SparkSession, path: String, dialect: Dialect): DataFrame = {
    ensureCharsetReadable(spark, dialect.encoding)
    spark.read
      .option("header", true)
      .option("sep", dialect.sep)
      .option("encoding", dialect.encoding)
      .option("quote", "\"")
      .option("escape", "\\")
      .option("mode", "PERMISSIVE")
      .option("inferSchema", false)
      .csv(path)
  }

  /** Exact ragged-row parity path (ref :150-156): a row longer than the
    * header has its overflow cells re-joined with the separator into the
    * last column; a shorter row is padded with "". Spark CSV PERMISSIVE
    * cannot express the re-join, so this path reads lines as text and
    * applies a small CSV splitter per partition (no driver materialization).
    * Caveat: line-based, so quoted fields spanning physical lines are not
    * supported on this path (use readCsv for those files). */
  def readCsvRaggedParity(spark: SparkSession, path: String, dialect: Dialect): DataFrame = {
    import spark.implicits._
    val sep = dialect.sep.head
    ensureCharsetReadable(spark, dialect.encoding)
    // whole physical lines through the CSV source, NOT the text source: the
    // text source has no encoding option (it silently reads UTF-8, which
    // would mojibake every cp1252 file on this path). A never-occurring
    // separator keeps each line one cell; quoting is disabled so the
    // splitter below (which implements the reference's quote semantics)
    // sees the raw line.
    val lines = spark.read
      .option("header", false)
      .option("sep", "\u0001") // a control char no textual CSV export contains
      .option("quote", "")
      .option("encoding", dialect.encoding)
      .option("mode", "PERMISSIVE")
      .csv(path)
      .select(col("_c0").cast("string"))
      .as[String]
      .filter((l: String) => l != null && l.trim.nonEmpty)
    val headerLine = lines.head() // one tiny action on the head partition
    val header = splitCsvLine(headerLine, sep).map(normHeader)
    val n = header.length
    // Skip only the FIRST physical line (the header), not every line equal
    // to it: a data row byte-identical to the header must survive, as in the
    // reference (which skips exactly row 0). zipWithIndex is deterministic
    // over the file source's partition order.
    val rows = lines.rdd.zipWithIndex()
      .filter(_._2 > 0L).map(_._1)
      .map { l =>
        val cells = splitCsvLine(l, sep)
        val fixed =
          if (cells.length > n) cells.take(n - 1) :+ cells.drop(n - 1).mkString(sep.toString)
          else if (cells.length < n) cells ++ Seq.fill(n - cells.length)("")
          else cells
        fixed
      }
    rows.toDF("cells")
      .select((0 until n).map(i => col("cells").getItem(i).as(header(i))): _*)
      .filter(concat_ws("", header.map(h => trim(col(s"`$h`"))): _*) =!= "")
  }

  /** Minimal CSV field splitter with the reference dialect: quotechar '"',
    * doublequote escaping, backslash escape (ref :133-136). */
  def splitCsvLine(line: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (ch == '\\' && i + 1 < line.length) { cur += line.charAt(i + 1); i += 2 }
      else if (inQ) {
        if (ch == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur += '"'; i += 2 }
          else { inQ = false; i += 1 }
        } else { cur += ch; i += 1 }
      } else if (ch == '"') { inQ = true; i += 1 }
      else if (ch == sep) { out += cur.result(); cur.clear(); i += 1 }
      else { cur += ch; i += 1 }
    }
    out += cur.result()
    out.result()
  }

  /** Rename via DE_PARA, fill missing canonical columns with "", project to
    * the fixed 40-column order (lineage excluded; ref :169-177). A file
    * carrying two accepted spelling variants of the same header (DE_PARA
    * maps three spellings to data_prev_entrega_original) keeps the FIRST
    * occurrence — the reference's pandas path would produce a duplicate
    * label and fail the COPY, quarantining a loadable file. */
  def aplicarMapeamento(df: DataFrame): DataFrame = {
    val seen = scala.collection.mutable.Set.empty[String]
    val projected = df.columns.zipWithIndex.flatMap { case (c, i) =>
      Schemas.dePara.get(normHeader(c)) match {
        case Some(canon) if !seen(canon) =>
          seen += canon
          Some(df.columns(i) -> canon)
        case _ => None // unknown header or later duplicate variant: dropped
      }
    }.toMap
    val renamed = df.select(df.columns.zipWithIndex.collect {
      case (c, i) if projected.contains(c) => col(s"`$c`").as(projected(c))
    }.toIndexedSeq: _*)
    val have = renamed.columns.toSet
    val target = Schemas.colunasDestino.filterNot(_ == "arquivo_origem")
    renamed.select(target.map(c =>
      if (have(c)) col(c) else lit("").as(c)): _*)
  }

  /** Blank-row filter (ref :141): drop rows where every cell is whitespace
    * (PERMISSIVE-read rows may carry nulls instead of ""). */
  def dropBlankRows(df: DataFrame): DataFrame =
    df.filter(
      df.columns.map(c => trim(coalesce(col(s"`$c`"), lit(""))) =!= "").reduce(_ || _))

  /** Full single-file load: sniff → read → blank-filter → gate → map →
    * lineage. Returns None when the file fails the header gate (caller
    * quarantines, ref :212-216). */
  def loadFile(spark: SparkSession, file: Path,
      raggedParity: Boolean = false): Option[DataFrame] = {
    val dialect = sniffDialect(file)
    val raw =
      if (raggedParity) readCsvRaggedParity(spark, file.toString, dialect)
      else readCsv(spark, file.toString, dialect)
    if (!headerValido(raw.columns.toSeq)) None
    else Some(
      aplicarMapeamento(dropBlankRows(raw))
        .withColumn("arquivo_origem", lit(file.getFileName.toString)))
  }

  /** File-queue discovery (ref :107-113): candidates in `novos` whose
    * lowercased basename is not already in `lidos` ∪ `erros`. Driver-side —
    * it is an anti-join over directory listings of a few hundred names. */
  def listarCsvNovos(novos: Path, lidos: Path, erros: Path): Seq[Path] = {
    def names(dir: Path): Set[String] =
      if (!Files.isDirectory(dir)) Set.empty
      else Files.list(dir).iterator.asScala
        .filter(p => p.getFileName.toString.toLowerCase.endsWith(".csv"))
        .map(_.getFileName.toString.toLowerCase).toSet
    val done = names(lidos) ++ names(erros)
    if (!Files.isDirectory(novos)) Seq.empty
    else Files.list(novos).iterator.asScala
      .filter(p => p.getFileName.toString.toLowerCase.endsWith(".csv"))
      .filterNot(p => done(p.getFileName.toString.toLowerCase))
      .toSeq.sortBy(_.getFileName.toString)
  }

  /** Quarantine-safe copy (ref :96-105): suffix `__dup_<ts>` on collision. */
  def safeCopy(src: Path, dstDir: Path): Path = {
    Files.createDirectories(dstDir)
    val base = src.getFileName.toString
    val dst0 = dstDir.resolve(base)
    val dst =
      if (!Files.exists(dst0)) dst0
      else {
        val ts = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
          .format(java.time.LocalDateTime.now)
        val (name, ext) = base.lastIndexOf('.') match {
          case -1 => (base, "")
          case i => (base.substring(0, i), base.substring(i))
        }
        dstDir.resolve(s"${name}__dup_$ts$ext")
      }
    Files.copy(src, dst, java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
    dst
  }
}
