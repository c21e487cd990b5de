package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The TightLoop single-owner contract is enforced, not just
  * documented (round-9 hardening, same CAS pattern as CacheScope): a
  * second thread opening a loop scope while one is held — i.e. a
  * concurrent iterative query that would otherwise silently plan with
  * the first loop's AQE-off + tiny-partition settings — throws at
  * scope entry, and the restore path always reinstates the session's
  * own conf even when the body throws.
  */
class TightLoopSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def aqe = spark.conf.getOption("spark.sql.adaptive.enabled")
  private def parts = spark.conf.get("spark.sql.shuffle.partitions")

  test("scoped sets loop conf inside, restores session conf after") {
    val (aqe0, parts0) = (aqe, parts)
    TightLoop.scoped(spark, 3) {
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "false")
      assert(parts == "3")
    }
    assert(aqe == aqe0 && parts == parts0)
  }

  test("restore runs even when the loop body throws") {
    val (aqe0, parts0) = (aqe, parts)
    intercept[RuntimeException] {
      TightLoop.scoped(spark, 2) { throw new RuntimeException("loop body died") }
    }
    assert(aqe == aqe0 && parts == parts0)
  }

  test("a second thread's loop inside an open scope fails loudly") {
    @volatile var caught: Throwable = null
    @volatile var innerRan = false
    TightLoop.scoped(spark, 2) {
      val t = new Thread(() => {
        try TightLoop.scoped(spark, 5) { innerRan = true }
        catch { case e: Throwable => caught = e }
      })
      t.start(); t.join()
    }
    assert(caught != null, "second-thread scope entry should have thrown")
    assert(caught.isInstanceOf[java.util.ConcurrentModificationException])
    assert(caught.getMessage.contains("process-global"))
    assert(!innerRan, "the second loop body must not run under the first's conf")
    // and the failed entry must not have disturbed the open scope's
    // restore: conf is back to the session's own settings here
    assert(parts != "2")
  }

  test("same-thread re-entry is rejected (nested restore would resurrect loop conf)") {
    @volatile var innerRan = false
    val caught = intercept[java.util.ConcurrentModificationException] {
      TightLoop.scoped(spark, 2) {
        TightLoop.scoped(spark, 5) { innerRan = true }
      }
    }
    assert(caught.getMessage.contains("TightLoop"))
    assert(!innerRan)
  }

  test("sequential scopes hand ownership over cleanly across threads") {
    TightLoop.scoped(spark, 2) { () }
    @volatile var ok = false
    val t = new Thread(() => TightLoop.scoped(spark, 3) { ok = true })
    t.start(); t.join()
    assert(ok)
    TightLoop.scoped(spark, 4) { () } // and back to this thread
  }
}
