package graft.operators

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

class FunnelOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // drain after every collect: funnelStaged scopes its v/c stage
  // persists (r17), and the suite must hand CacheScope ownership back
  // cleanly for whatever spec thread runs next
  private def rows(df: org.apache.spark.sql.DataFrame) =
    try df.collect().map(_.toSeq).toSeq
    finally graft.CacheScope.drain()

  test("fold and staged forms agree on the events table") {
    val e = Tables(spark, "/root/testdata/sf0.001").events
    assert(rows(FunnelOps.funnelFold(e)) == rows(FunnelOps.funnelStaged(e)))
  }

  test("single-user firehose: staged form stays in streaming hash aggregates and agrees with the fold") {
    // one bot user emitting 200k events, conversion buried mid-stream;
    // a handful of normal users around it
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(sec: Long) = new java.sql.Timestamp(base + sec * 1000)
    val bot = (0 until 200000).map { i =>
      val ty = i match {
        case 100000 => "view"
        case 150000 => "click"
        case 180000 => "purchase"
        case _ => if (i % 3 == 0) "view" else "scroll" // views BEFORE 100000 exist too
      }
      (42L, ty, ts(i.toLong))
    }
    val normal = Seq(
      (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      (2L, "view", ts(10)), (2L, "click", ts(5)), // click before view: stage 1
      (3L, "click", ts(1))) // no view: excluded
    val e = (bot ++ normal).toDF("user_id", "event_type", "ts")
      .repartition(16)
    val fold = rows(FunnelOps.funnelFold(e))
    val staged = rows(FunnelOps.funnelStaged(e))
    assert(fold == staged)
    // sanity on the semantics: bot's first view is at i=0, first click
    // after it is the buried one at 150000, purchase at 180000
    val botRow = fold.find(_.head == 42L).get
    assert(botRow(2) == 3) // stage
    // bounded state evidence: the staged plan has no collected arrays /
    // object aggregation buffers — plain (partial) hash aggregates only
    val plan = FunnelOps.funnelStaged(e).queryExecution.executedPlan.toString
    graft.CacheScope.drain() // the build above scoped the v/c persists
    assert(!plan.contains("collect_list"), "staged form must not collect arrays")
    assert(!plan.contains("ObjectHashAggregate"), "staged form must not use object agg buffers")
  }
}
