package graft

import org.apache.spark.sql.DataFrame

/** Cleanup registry for intermediates persisted inside a query lambda.
  *
  * A query that caches a shared sub-plan (an LSH signature, a PQ
  * sub-distance table) cannot unpersist it before returning — the
  * returned DataFrame is lazy and the cache is only populated (and
  * read) when the CALLER runs an action. Routing those persists
  * through [[scoped]] records them here so the caller can release
  * every block with one [[drain]] after its action completes.
  * `graft.Verify` and `graft.Bench` drain after each query; library
  * callers embedding a query in a longer-lived session should do the
  * same (or accept LRU eviction pressure).
  *
  * CONTRACT — single-threaded, one action per query, then drain. The
  * registry is process-global by design (one registry, one drain
  * point, zero plumbing through query signatures), which means:
  *   - concurrent query builds would interleave registrations, and a
  *     drain by one caller unpersists the other's in-flight caches —
  *     build and run queries sequentially per process;
  *   - after drain, re-running an action on a returned frame
  *     recomputes scoped sub-plans uncached; for the
  *     [[graft.operators.DistributedRank]] kernels specifically the
  *     recomputed range partitioning may sample differently than the
  *     driver-frozen offsets, so collect results BEFORE draining and
  *     treat returned frames as single-action.
  * Callers needing concurrent queries should hold their own persists
  * instead of [[scoped]] and release them per-query.
  *
  * The contract is ENFORCED, not just documented: the first [[scoped]]
  * call after a drain records the owning thread, and a registration
  * from any other thread before the next [[drain]] throws — loudly,
  * at build time — instead of letting a second session's drain
  * silently unpersist the first's in-flight caches (which would not
  * corrupt results, lazy frames recompute, but would corrupt the
  * drain accounting and every timing built on it).
  */
object CacheScope {
  private val registry = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val owner = new java.util.concurrent.atomic.AtomicReference[Thread](null)

  /** Persist `df` and register it for the next [[drain]]. */
  def scoped(df: DataFrame): DataFrame = {
    val me = Thread.currentThread()
    val prev = owner.compareAndExchange(null, me)
    if (prev != null && (prev ne me))
      throw new java.util.ConcurrentModificationException(
        s"CacheScope: thread '${me.getName}' registered a scoped cache while " +
          s"thread '${prev.getName}' has undrained registrations — the registry " +
          "is single-owner between drains (see the class contract); run queries " +
          "sequentially or hold persists privately for concurrent work")
    val p = df.persist()
    registry.add(p)
    p
  }

  /** Below this optimizer size estimate a shared subtree is cheaper
    * to recompute than to materialize: the r7→r8 measurements had the
    * unconditional persist costing q125 1.95× and q111 1.29× at sf0.1
    * while winning 1.3–1.6× at 100×. Measured estimates for those
    * subtrees: 0.5–0.9 MB at sf0.1 vs 53–95 MB at 100× — 16 MB sits
    * 16× above the small side and 3× below the large side.
    */
  val DefaultLargeInputBytes: Long = 16L << 20

  /** [[scoped]] only when the subtree's optimizer size estimate says
    * the input is big enough for materialization to pay for itself;
    * below the threshold the frame is returned unpersisted and each
    * consumer recomputes it (correct for any deterministic subtree —
    * the same contract recomputation after [[drain]] already relies
    * on). Size comes from `optimizedPlan.stats.sizeInBytes` — scan
    * estimates (file sizes) propagated through projections — so the
    * decision needs no extra job.
    */
  def scopedIfLarge(
      df: DataFrame,
      minInputBytes: Long = DefaultLargeInputBytes): DataFrame =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes >= minInputBytes) scoped(df)
    else df

  /** Unpersist (non-blocking) everything registered since the last
    * drain. Safe to call with nothing registered, and safe to call
    * after `catalog.clearCache()` (unpersist of an evicted frame is a
    * no-op). Enforced symmetrically with [[scoped]]: a drain from a
    * thread that is not the recorded owner while registrations are
    * outstanding throws instead of silently unpersisting the owner's
    * in-flight caches. */
  def drain(): Unit = {
    val o = owner.get()
    if (o != null && (o ne Thread.currentThread()) && !registry.isEmpty)
      throw new java.util.ConcurrentModificationException(
        s"CacheScope: thread '${Thread.currentThread().getName}' drained while " +
          s"thread '${o.getName}' has undrained registrations — the registry is " +
          "single-owner between drains (see the class contract)")
    var df = registry.poll()
    while (df != null) {
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
      df = registry.poll()
    }
    // release ownership last: a racing scoped() between the final poll
    // and this point re-claims for its own thread, which is the
    // sequential hand-off the contract allows
    owner.set(null)
  }
}
