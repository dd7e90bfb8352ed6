package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** connectedComponents controls its loop's shuffle width plan-locally
  * (explicit repartition on the loop keys) — it must NOT mutate
  * `spark.sql.shuffle.partitions`, so anything planned concurrently on the
  * same session keeps full session width. */
class CcConcurrencySpec extends SparkSpec {

  test("session shuffle width is untouched while a CC fixpoint runs") {
    import spark.implicits._
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    // A long chain (path graph) forces several pointer-jump rounds.
    val pairs = (1L until 400L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fut = Future(Dedup.connectedComponents(pairs, driverLocalMaxEdges = 0L))
    // Poll the session conf the whole time the loop is live: with plan-local
    // width control the value can never change, not even transiently.
    var observed = Set.empty[String]
    while (!fut.isCompleted)
      observed += spark.conf.get("spark.sql.shuffle.partitions")
    val labels = Await.result(fut, 120.seconds)
    assert(observed == Set(before),
      s"session shuffle width changed mid-loop: observed $observed")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
    // and the answer is still right: one chain, everything labeled 1
    val out = labels.agg(countDistinct(col("keeper_id")), count(lit(1))).first()
    assert(out.getLong(0) == 1L && out.getLong(1) == 400L)
  }

  test("a query planned mid-loop keeps session width in its exchanges") {
    import spark.implicits._
    val width = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val pairs = (1L until 300L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fut = Future(Dedup.connectedComponents(pairs, driverLocalMaxEdges = 0L))
    // Plan (don't execute) an unrelated aggregation while the loop runs and
    // read the exchange width out of its physical plan: AQE coalescing acts
    // at runtime, so the PLANNED width is the session conf verbatim.
    var widths = Set.empty[Int]
    while (!fut.isCompleted) {
      val plan = spark.range(1000).groupBy(expr("id % 7")).count()
        .queryExecution.executedPlan
      var found = List.empty[Int]
      plan.foreach {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          found ::= e.outputPartitioning.numPartitions
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.foreach {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
              found ::= e.outputPartitioning.numPartitions
            case _ =>
          }
        case _ =>
      }
      widths ++= found
    }
    Await.result(fut, 120.seconds)
    assert(widths.nonEmpty, "never saw an exchange in the probe plan")
    assert(widths == Set(width), s"probe query planned at widths $widths, expected $width")
  }
}
