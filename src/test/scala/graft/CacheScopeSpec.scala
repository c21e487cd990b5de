package graft

import org.scalatest.funsuite.AnyFunSuite

/** The CacheScope single-owner contract is enforced, not just
  * documented: interleaved registration from a second thread before
  * the owner drains must throw (a second session's drain would
  * otherwise silently unpersist the first's in-flight caches and
  * corrupt the drain accounting).
  */
class CacheScopeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(1, 2, 3).toDF("v")

  test("sequential scope-drain-scope hands ownership over cleanly") {
    CacheScope.drain() // isolate from any prior suite state
    val a = CacheScope.scoped(df)
    assert(a.count() == 3)
    CacheScope.drain()
    // a different thread may own the next scope once drained — and
    // must drain its own registrations (the r8 symmetric guard makes
    // a cross-thread cleanup drain an error, not a courtesy)
    var ok = false
    val t = new Thread(() => { CacheScope.scoped(df); ok = true; CacheScope.drain() })
    t.start(); t.join()
    assert(ok)
    CacheScope.drain()
  }

  test("interleaved registration from a second thread throws") {
    CacheScope.drain()
    CacheScope.scoped(df) // this thread now owns the scope
    @volatile var caught: Throwable = null
    val t = new Thread(() => {
      try CacheScope.scoped(df)
      catch { case e: Throwable => caught = e }
    })
    t.start(); t.join()
    assert(caught != null, "second-thread registration should have thrown")
    assert(caught.isInstanceOf[java.util.ConcurrentModificationException])
    assert(caught.getMessage.contains("single-owner"))
    CacheScope.drain()
  }

  test("the owning thread may register repeatedly before draining") {
    CacheScope.drain()
    CacheScope.scoped(df)
    CacheScope.scoped(df)
    CacheScope.scoped(df)
    CacheScope.drain()
  }

  test("drain with nothing registered is a no-op and releases ownership") {
    CacheScope.drain()
    CacheScope.drain()
    val t = new Thread(() => { CacheScope.scoped(df); CacheScope.drain() })
    t.start(); t.join()
    CacheScope.drain()
  }

  test("a non-owner drain with undrained registrations throws; the owner's caches survive") {
    CacheScope.drain()
    val p = CacheScope.scoped(df)
    @volatile var caught: Throwable = null
    val t = new Thread(() => {
      try CacheScope.drain()
      catch { case e: Throwable => caught = e }
    })
    t.start(); t.join()
    assert(caught != null, "non-owner drain should have thrown")
    assert(caught.isInstanceOf[java.util.ConcurrentModificationException])
    assert(p.storageLevel.useMemory, "owner's cache was unpersisted by the stranger")
    CacheScope.drain()
  }

  test("scopedIfLarge persists above the size estimate threshold and skips below it") {
    CacheScope.drain()
    val big = TestSpark.spark.range(10 * 1000 * 1000).toDF("id") // est ≈ 80 MB
    val small = TestSpark.spark.range(1000).toDF("id") // est ≈ 8 kB
    val bigOut = CacheScope.scopedIfLarge(big)
    assert(bigOut.storageLevel.useMemory || bigOut.storageLevel.useDisk,
      "large input should have been registered for persist")
    val smallOut = CacheScope.scopedIfLarge(small)
    assert(smallOut.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "small input should not persist")
    // explicit floor overrides the default both ways
    val forced = CacheScope.scopedIfLarge(small, minInputBytes = 1L)
    assert(forced.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    CacheScope.drain()
  }
}
