package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CusumRepro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = 1704067200L
    def batch(hours: Seq[(Long, Long)]) =
      hours.flatMap { case (h, c) =>
        (0L until c).map(j => (h * 100L + j, t0 + h * 3600L))
      }.toDF("event_id", "sec")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
        .withColumn("event_type", lit("click"))
    val all = batch(Seq(0L -> 3L, 1L -> 3L, 2L -> 30L, 3L -> 30L))
      .unionByName(batch(Seq(5L -> 3L, 6L -> 3L, 7L -> 3L)))
    val mus = graft.streaming.EventWindows.cusumReference(all)
    println("MUS=" + mus)
    val out = graft.streaming.EventWindows.cusumStateful(spark, all, mus)
      .collect()
    println("BATCH_OK rows=" + out.length)
    spark.stop()
  }
}
