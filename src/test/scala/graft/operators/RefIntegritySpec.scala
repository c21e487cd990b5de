package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

import java.nio.file.Files

/** q108's collapsed-child anti-join audited against independently
  * derived orphan counts on a corpus with NULL child keys (orphans by
  * NOT-EXISTS semantics) and genuine orphans on every relationship —
  * the pre-aggregation and the raw (non-distinct) parent side must
  * not change a single count.
  */
class RefIntegritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Synthetic warehouse: customers 1..50; orders 1..400 with custkeys
    * including orphans (custkey 900+) and a NULL; lineitems over
    * orderkeys including orphans (5000+) and NULLs; events over
    * user_ids including orphans and a NULL.
    */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("ri-spec").toString
    (1L to 50L).toDF("c_custkey")
      .withColumn("c_name", concat(lit("c"), col("c_custkey")))
      .coalesce(1).write.parquet(s"$d/customer.parquet")
    val rng = new scala.util.Random(7)
    val orderRows = (1L to 400L).map { ok =>
      val ck: java.lang.Long =
        if (ok % 97 == 0) java.lang.Long.valueOf(900L + ok) // orphan custkey
        else if (ok == 123L) null // NULL custkey: orphan by definition
        else java.lang.Long.valueOf(1L + rng.nextInt(50))
      (ok, ck)
    }
    orderRows.toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    val liRows = (1L to 1200L).map { i =>
      val ok: java.lang.Long =
        if (i % 101 == 0) java.lang.Long.valueOf(5000L + i) // orphan orderkey
        else if (i % 211 == 0) null
        else java.lang.Long.valueOf(1L + rng.nextInt(400))
      (i, ok)
    }
    liRows.toDF("l_linenumber", "l_orderkey")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    val evRows = (1L to 300L).map { i =>
      val uid: java.lang.Long =
        if (i % 37 == 0) java.lang.Long.valueOf(777L + i)
        else if (i == 5L) null
        else java.lang.Long.valueOf(1L + rng.nextInt(50))
      (i, uid)
    }
    evRows.toDF("event_id", "user_id")
      .withColumn("ts", to_timestamp(lit("2026-01-01 00:00:00")))
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  private def runQ108(): Seq[String] = {
    val rows =
      try SparkEntry.queries("q108_ref_integrity")(spark, dir).collect()
      finally graft.CacheScope.drain()
    rows.map(_.toString).toSeq
  }

  test("orphan counts exact under NULL keys, orphan keys, and duplicated child keys") {
    val got = runQ108()
    // expected orphan counts, derived independently of the engine
    val expected = Seq(
      s"[events.user_id->customer,300,${300 / 37 + 1}]",
      s"[lineitem.l_orderkey->orders,1200,${1200 / 101 + 1200 / 211}]",
      s"[orders.o_custkey->customer,400,${400 / 97 + 1}]")
    assert(got.sorted == expected.sorted)
  }
}
