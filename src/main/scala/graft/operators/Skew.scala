package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffle joins — the fallback when AQE's
  * skew-join splitting can't apply (e.g. bucketed inputs, or a build
  * side that must stay hash-partitioned).
  *
  * Classic salting: the probe side deterministically spreads each key
  * over `nSalts` sub-keys (salt derived by hashing the WHOLE row, so it
  * needs no random state and replays identically); the build side is
  * replicated once per salt. The join key becomes (key, salt), so a
  * celebrity key's rows land on `nSalts` reducers instead of one.
  * Cost: build side inflates ×nSalts — use for big-probe/small-build
  * shapes with a few dominant keys.
  */
object Skew {

  /** Inner equi-join of `probe` and `build` on probe(probeKey) ==
    * build(buildKey), salted with `nSalts`. Result equals the plain
    * join exactly (bag semantics): every probe row matches exactly its
    * own salt's copy of each matching build row.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, nSalts: Int): DataFrame = {
    val salted = probe.withColumn("_salt",
      pmod(hash(probe.columns.map(col): _*), lit(nSalts)))
    val replicated = build.withColumn("_salt",
      explode(lit((0 until nSalts).toArray)))
    salted.join(replicated,
      salted(probeKey) === replicated(buildKey) &&
        salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
