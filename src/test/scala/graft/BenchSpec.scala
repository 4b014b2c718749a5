package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bench's failure-visibility contract: a throwing query must surface
  * as an `errors` count (and an all-reps failure must fail the run),
  * never as a suspiciously fast timing sample.
  */
class BenchSpec extends SparkSpec {

  private def q(fn: SparkSession => DataFrame)
      : (SparkSession, String) => DataFrame = (s, _) => fn(s)

  test("a throwing query becomes an errors entry, not a timing") {
    val queries = Map(
      "good" -> q(s => s.range(10).toDF()),
      "boom" -> q(_ => throw new RuntimeException("deliberate")))
    val samples = Bench.sample(spark, "unused", queries, reps = 2)
    assert(samples.forall(_("good").isDefined))
    assert(samples.forall(_("boom").isEmpty))
    val (stdoutJson, fileJson, allFailed) =
      Bench.render(queries.keys.toSeq, samples, 2, "sf-test")
    assert(allFailed === Seq("boom"))
    // the broken query reports -1 (no fabricated duration) and an
    // explicit failure count in BOTH json forms
    assert(stdoutJson.contains("\"boom\":-1"), stdoutJson)
    assert(stdoutJson.contains("\"errors\":{\"boom\":2}"), stdoutJson)
    assert(fileJson.contains("\"boom\":[-1,-1]"), fileJson)
    assert(fileJson.contains("\"errors\":{\"boom\":2}"), fileJson)
    // the healthy query still reports a real median and no error
    assert(!stdoutJson.contains("\"good\":-1"), stdoutJson)
  }

  test("a transient failure counts as an error but keeps the surviving medians") {
    var calls = 0
    val queries = Map(
      "flaky" -> q { s => calls += 1
        if (calls == 1) throw new RuntimeException("first rep only")
        s.range(10).toDF()
      })
    val samples = Bench.sample(spark, "unused", queries, reps = 3)
    val (stdoutJson, _, allFailed) =
      Bench.render(queries.keys.toSeq, samples, 3, "sf-test")
    // two good samples → a real median; one failure → errors:1; the
    // run as a whole still passes (exit stays 0)
    assert(allFailed.isEmpty)
    assert(stdoutJson.contains("\"errors\":{\"flaky\":1}"), stdoutJson)
    assert(!stdoutJson.contains("\"flaky\":-1"), stdoutJson)
  }

  test("a query-local fatal error is recorded; the run continues to later queries") {
    // a StackOverflowError (e.g. from pathologically deep codegen) is
    // fatal-but-query-local: the old NonFatal catch let it abort the
    // whole run before any JSON was emitted — it must instead become an
    // errors entry while the remaining queries still get timed
    val queries = scala.collection.immutable.ListMap(
      "deep" -> q(_ => throw new StackOverflowError("deliberate")),
      "after" -> q(s => s.range(5).toDF()))
    val samples = Bench.sample(spark, "unused", queries, reps = 2)
    assert(samples.forall(_("deep").isEmpty))
    assert(samples.forall(_("after").isDefined))
    // process-fatal errors still abort: a dead JVM must not keep timing
    val oom = Map("oom" -> q(_ => throw new OutOfMemoryError("deliberate")))
    intercept[OutOfMemoryError] {
      Bench.sample(spark, "unused", oom, reps = 1)
    }
  }

  test("an all-green run renders an empty errors object") {
    val queries = Map("good" -> q(s => s.range(3).toDF()))
    val samples = Bench.sample(spark, "unused", queries, reps = 1)
    val (stdoutJson, _, allFailed) =
      Bench.render(queries.keys.toSeq, samples, 1, "sf-test")
    assert(allFailed.isEmpty)
    assert(stdoutJson.contains("\"errors\":{}"), stdoutJson)
  }
}
