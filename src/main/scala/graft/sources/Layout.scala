package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
