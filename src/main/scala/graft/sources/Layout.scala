package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import scala.jdk.CollectionConverters._

/** Storage-LAYOUT utilities — the write-side half of scan pruning.
  * Filter pushdown only pays off if the files carry statistics worth
  * pruning on: a corpus written in arrival order has every file
  * spanning the whole key domain, and a range predicate still reads
  * everything. At 100 TB the layout IS the index.
  */
object Layout {

  /** Range-clustered parquet write: `repartitionByRange` on the key
    * (one global sample-based range exchange) + an in-partition sort,
    * so each output file covers a NARROW, pairwise-disjoint key span
    * and its parquet row-group statistics actually exclude it from
    * out-of-range scans — Spark's parquet reader prunes row groups
    * from the pushed filter, and any zone-map-reading engine skips
    * the same files. `files` sizes the layout: pick
    * ceil(corpus / executor-comfortable-bytes), same reasoning as
    * `spark.sql.files.maxPartitionBytes`.
    *
    * The in-partition sort additionally makes each file internally
    * ordered — every row group inside a file covers a sub-span, so
    * pruning works at row-group granularity too, and downstream
    * merge-style readers see sorted runs.
    */
  def writeRangeClustered(df: DataFrame, dir: String, key: String,
      files: Int): Unit = {
    require(files >= 1, s"files must be >= 1, got $files")
    df.repartitionByRange(files, col(key)).sortWithinPartitions(key)
      .write.mode("overwrite").parquet(dir)
  }

  /** Per-file (path, min, max) of a BIGINT `key`, read straight from
    * the parquet footers (row-group column stats rolled up per file)
    * — the checkable evidence of `writeRangeClustered`'s promise. A
    * rehearsal/spec asserts these spans are pairwise disjoint; an
    * ops runbook reads them to see whether a table still prunes or
    * has degraded into arrival-order files.
    */
  def fileKeyRanges(spark: SparkSession, dir: String,
      key: String): Seq[(String, Long, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map { f =>
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(f.getPath, conf))
        try {
          val stats = reader.getFooter.getBlocks.asScala.flatMap { b =>
            b.getColumns.asScala
              .find(_.getPath.toDotString == key)
              .map(_.getStatistics)
          }
          require(stats.nonEmpty, s"no stats for '$key' in ${f.getPath}")
          val mins = stats.map(_.genericGetMin.asInstanceOf[Number].longValue)
          val maxs = stats.map(_.genericGetMax.asInstanceOf[Number].longValue)
          (f.getPath.getName, mins.min, maxs.max)
        } finally reader.close()
      }
      .sortBy(_._2)
  }

  /** SMALL-FILE COMPACTION: rewrite a parquet dir into
    * ~`targetBytes`-sized files, preserving content exactly — the
    * maintenance pass every streaming/append ingest needs, because a
    * thousand 1 MB files cost a thousand task launches and footer
    * reads per scan. With `key` set the rewrite goes through
    * `repartitionByRange` + sort, so compaction RESTORES range
    * clustering rather than destroying it (a plain round-robin
    * rewrite de-clusters); without it, a round-robin repartition
    * balances bytes.
    *
    * Returns (files before, files after). The swap is
    * write-tmp → delete → rename, NOT atomic: a reader racing the
    * swap can see a missing dir. That is the same contract as every
    * non-transactional parquet rewrite; pair it with a manifest/table
    * format for concurrent readers at production scale.
    */
  def compact(spark: SparkSession, dir: String, targetBytes: Long,
      key: Option[String] = None): (Int, Int) = {
    require(targetBytes > 0L, s"targetBytes must be positive, got $targetBytes")
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val dataFiles = fs.listStatus(root).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    require(dataFiles.nonEmpty, s"compact: no parquet files under $dir")
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1L) / targetBytes).toInt
    val df = spark.read.parquet(dir)
    val out = key match {
      case Some(k) => df.repartitionByRange(nOut, col(k)).sortWithinPartitions(k)
      case None => df.repartition(nOut)
    }
    val tmp = new Path(root.getParent, root.getName + ".compact_tmp")
    out.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(root, true)
    require(fs.rename(tmp, root), s"compact: rename $tmp -> $root failed")
    val after = fs.listStatus(root).toSeq
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (dataFiles.length, after)
  }

  /** Bits per dimension of the Z-order key — each dim normalizes to a
    * 2^16 grid, the interleaved key is 32 bits. Same constant MUST
    * appear in the oracle SQL.
    */
  val ZBits = 16

  /** log2(buckets) for the zone-map gates: the top `ZBucketBits` bits
    * of the z-key partition the corpus into 64 "files".
    */
  val ZBucketBits = 6

  /** Normalize `x` into the [0, 2^ZBits) grid over [mn, mx]:
    * `(x − mn) · 2^ZBits div (mx − mn + 1)` — exact integer, in-range
    * by construction (the +1 keeps mx strictly under the top cell
    * boundary). Overflow-safe for any 64-bit dim whose span times
    * 65536 stays under 2^63 — microsecond epochs (~3e13 span) and id
    * domains both qualify; a full-range 64-bit dim must pre-shift.
    */
  private def gridCell(x: Column, mn: Long, mx: Long): Column = {
    // IntegralDivide, NOT double divide: the ts numerator (~2e18)
    // is far past double's 2^53 exact-integer range
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression((x - lit(mn)) * lit(1L << ZBits)),
      Literal(mx - mn + 1L)))
  }

  /** Bit-interleave two grid cells (a gets the odd bits — the
    * classic Morton curve). Pure long shifts/masks, engine-portable.
    */
  private def morton(a: Column, b: Column): Column =
    (0 until ZBits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)
    }

  /** Z-ORDER ZONE MAP over the events stream — the multi-dimensional
    * clustering audit: normalize (user_id, event time) to a 2^16 grid,
    * interleave into the Morton key, cut the key's top bits into 64
    * "files", and report each file's row count and per-dimension
    * min/max — exactly the footer statistics a parquet write ordered
    * by this key would carry. A linear layout clusters ONE dimension;
    * the Morton curve gives every file a narrow span in BOTH, which
    * is what lets a user-range predicate skip files in a table laid
    * out for time queries (and vice versa). `zorderPruning` turns
    * this map into the skipped-file counts; `writeRangeClustered` on
    * a materialized zkey column is the write path.
    *
    * Scale shape: the 4-value min/max stats row collects to the
    * driver (1 row — the bm25/IVF driver-bound discipline) and
    * returns as literals, so the corpus pass is one map stage (grid +
    * interleave are long shifts inside codegen) and one 64-group
    * aggregation with map-side combine. Nothing else moves; at 100 TB
    * the stats pass is a columnar min/max scan.
    */
  def zorderZoneMap(events: DataFrame): DataFrame =
    zoneMapFromStats(events, zStats(events))

  /** `zorderZoneMap` from PRECOMPUTED corpus stats — `zorderPruning`
    * already pays the 1-row min/max collect for its predicate bounds,
    * so it hands the same tuple here instead of re-scanning the
    * corpus for a second identical stats pass.
    */
  private def zoneMapFromStats(events: DataFrame,
      stats: (Long, Long, Long, Long)): DataFrame = {
    val (umn, umx, tmn, tmx) = stats
    val e = events.select(col("user_id"),
      unix_micros(col("ts")).as("us"))
    e.select(
        morton(gridCell(col("user_id"), umn, umx),
          gridCell(col("us"), tmn, tmx)).as("zkey"),
        col("user_id"), col("us"))
      .select(shiftright(col("zkey"), 2 * ZBits - ZBucketBits)
        .as("bucket"), col("user_id"), col("us"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_events"),
        min("user_id").as("min_user"), max("user_id").as("max_user"),
        min("us").as("min_us"), max("us").as("max_us"))
  }

  /** The one-row PRUNING VERDICT the zone map exists for: against a
    * derived user-range predicate (the middle [span/4, span/2) slice
    * of the id domain — derived identically in the oracle, so the
    * gate is corpus-independent), count the files a zone-map reader
    * must touch under (a) the Z-order layout and (b) a pure
    * time-clustered layout, plus the rows actually selected. The
    * time-clustered side is the control: its per-file user spans
    * cover the whole domain, so it touches ~every file, while the
    * Morton layout touches the ~quarter of files whose user bits
    * intersect the slice — the measured difference IS the reason to
    * pay for multi-dim clustering on a 100 TB table queried on more
    * than one axis.
    */
  def zorderPruning(events: DataFrame): DataFrame = {
    val stats @ (umn, umx, tmn, tmx) = zStats(events)
    val span = umx - umn + 1L
    val lo = umn + span / 4L
    val hi = umn + span / 2L
    val zTouched = zoneMapFromStats(events, stats)
      .agg(count(lit(1)).as("z_files"),
        sum((col("min_user") <= lit(hi) && col("max_user") >= lit(lo))
          .cast("long")).as("z_touched"))
    val e = events.select(col("user_id"), unix_micros(col("ts")).as("us"))
    val tTouched = e
      .select(shiftright(gridCell(col("us"), tmn, tmx),
          ZBits - ZBucketBits).as("bucket"), col("user_id"))
      .groupBy("bucket")
      .agg(min("user_id").as("min_user"), max("user_id").as("max_user"))
      .agg(count(lit(1)).as("t_files"),
        sum((col("min_user") <= lit(hi) && col("max_user") >= lit(lo))
          .cast("long")).as("t_touched"))
    val sel = e.agg(sum((col("user_id").between(lo, hi)).cast("long"))
      .as("rows_selected"))
    zTouched.crossJoin(tTouched).crossJoin(sel)
  }

  /** Driver-bounded min/max stats for the z-order gates (1 row). */
  private def zStats(events: DataFrame): (Long, Long, Long, Long) = {
    val r = events.agg(
      min("user_id"), max("user_id"),
      min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }
}
