package graft

import org.apache.spark.sql.SparkSession

/** Release every cache a query pipeline pinned: DataFrame/Dataset
  * persists (the SQL cache manager) AND RDD-level persists (the
  * dupClusters iterative core).
  *
  * Cache ownership contract: operators persist exactly what they
  * internally reuse within one query; the CONSUMER that triggered the
  * action calls `Caches.clear` when it is done with the result. That
  * scopes persistence to a query, so a long-lived session running many
  * queries back-to-back (PipelineApp, Verify, Bench, notebooks) never
  * accumulates dead cached blocks until LRU eviction starts thrashing.
  */
object Caches {
  def clear(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
