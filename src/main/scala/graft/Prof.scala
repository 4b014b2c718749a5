package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val family = Seq("graph_closeness", "graph_scc", "graph_hops_deep",
      "graph_eccentricity", "graph_stress", "graph_hops", "graph_diameter")
    (1 to 3).foreach { i =>
      family.foreach { q =>
        t(f"$q%-24s #$i")(SparkEntry.queries(q)(spark, d).count())
        println(s"PROF   hits de=${graft.operators.GraphOps.deMemoHits.get()} dist=${graft.operators.GraphOps.distMemoHits.get()}")
        graft.Caches.clear(spark)
      }
    }
    spark.stop()
  }
}
