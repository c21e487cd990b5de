package graft.sources

/** Per-query layout dispatch (r14): the bucketed-warehouse toggle is
  * process-global (env/sysprop), but the suite wants BOTH layouts at
  * once — orderkey join/agg heads win 2–4× over the exchange-free
  * bucketed scan, while iterative rescanners (q101's PageRank loop at
  * r13) and anything whose parallelism is set by the SCAN shape want
  * the splittable plain parquet (a bucketed catalog scan is pinned to
  * one task per bucket file).
  *
  * A [[graft.QueryDef]] marked `plainLayout` builds inside
  * [[withPlain]], and [[BucketedWarehouse.resolve]] then skips
  * catalog resolution for every table the build touches. Thread-local
  * because query BUILD is single-threaded per query by the engine's
  * session contract (see [[graft.CacheScope]]); resolution happens at
  * build time, so the scope only needs to cover the `run(spark, dir)`
  * call, not the later action.
  */
object LayoutPreference {

  private val pinPlain: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  /** True while the current thread builds a query pinned to the plain
    * parquet layout.
    */
  def plainPinned: Boolean = pinPlain.get.booleanValue

  def withPlain[A](body: => A): A = {
    val prev = pinPlain.get
    pinPlain.set(java.lang.Boolean.TRUE)
    try body finally pinPlain.set(prev)
  }
}
