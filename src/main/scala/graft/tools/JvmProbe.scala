package graft.tools

import java.lang.management.ManagementFactory

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Point-in-time JVM + Spark-state snapshot for the suite-state-tax
  * diagnosis (r10): every counter the "accumulated state" hypotheses
  * name — heap, GC totals, loaded classes, metaspace, JIT code cache,
  * block-manager disk scratch (leftover shuffle/spill files), memory
  * store, and live block counts. `graft.Bench` records one snapshot
  * per query in probe mode (`SPARK_GRAFT_PROBE=1`) so a slow query
  * late in a suite can be attributed to a *mechanism* instead of a
  * label: whichever counter grew between its isolated run and its
  * in-suite run is the suspect.
  */
object JvmProbe {

  /** Ordered (key, value) pairs — stable key order so the JSONL
    * sidecar diffs cleanly across rounds.
    */
  def snapshot(spark: SparkSession): Seq[(String, Long)] = {
    val sc = spark.sparkContext
    val rt = Runtime.getRuntime
    val gcs = ManagementFactory.getGarbageCollectorMXBeans.asScala
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
    def poolMb(substr: String): Long = pools
      .filter(_.getName.toLowerCase.contains(substr))
      .map(_.getUsage.getUsed).sum / (1 << 20)
    val (diskFiles, diskBytes) = org.apache.spark.graft.SparkStateProbe.diskUsage(sc)
    val (rddBlocks, bcBlocks, otherBlocks) =
      org.apache.spark.graft.SparkStateProbe.blockCounts(sc)
    Seq(
      "heap_used_mb" -> (rt.totalMemory() - rt.freeMemory()) / (1 << 20),
      "gc_count" -> gcs.map(_.getCollectionCount).sum,
      "gc_ms" -> gcs.map(_.getCollectionTime).sum,
      "classes_loaded" -> ManagementFactory.getClassLoadingMXBean.getLoadedClassCount.toLong,
      "metaspace_mb" -> poolMb("metaspace"),
      "code_cache_mb" -> poolMb("codeheap"),
      "threads" -> ManagementFactory.getThreadMXBean.getThreadCount.toLong,
      "disk_scratch_files" -> diskFiles,
      "disk_scratch_mb" -> diskBytes / (1 << 20),
      "mem_store_mb" -> org.apache.spark.graft.SparkStateProbe.memoryStoreBytes(sc) / (1 << 20),
      "exec_mem_mb" -> org.apache.spark.graft.SparkStateProbe.executionMemoryBytes(sc) / (1 << 20),
      "rdd_blocks" -> rddBlocks.toLong,
      "broadcast_blocks" -> bcBlocks.toLong,
      "other_blocks" -> otherBlocks.toLong) ++ cpuTimes
  }

  /** Process user/system CPU and host iowait/total — the regime
    * counters (r10 verdict item: the measurement regime lived in
    * prose; now each bench row carries the sys-time share and iowait
    * share of its own window). Ticks are converted at the canonical
    * USER_HZ=100; consumers only ever use deltas and RATIOS of these,
    * so the constant cancels even where a kernel deviates.
    */
  def cpuTimes: Seq[(String, Long)] = {
    val self = try {
      val stat = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/self/stat")))
      val rest = stat.substring(stat.lastIndexOf(')') + 2).split(" ")
      // fields 14/15 (utime/stime) land at rest(11)/rest(12): rest(0)
      // is field 3
      Seq("proc_utime_ms" -> rest(11).toLong * 10,
        "proc_stime_ms" -> rest(12).toLong * 10)
    } catch { case _: Throwable => Seq("proc_utime_ms" -> -1L, "proc_stime_ms" -> -1L) }
    val host = try {
      // first 8 fields only (user..steal): guest/guest_nice are
      // already included inside user/nice, and summing them would
      // double-count VM time and bias the iowait share low
      val cpu = scala.io.Source.fromFile("/proc/stat").getLines()
        .next().trim.split("\\s+").drop(1).take(8).map(_.toLong)
      // steal (field 8) = cycles the HYPERVISOR ran someone else while
      // this guest's vCPU was runnable. Invisible to thread-CPU
      // accounting (the guest books stolen time as if the thread ran),
      // so it is the only direct witness for the 3-30× single-slot
      // storms measured r13: wall and "CPU" inflate together, iowait
      // stays 0, and no in-process counter moves.
      Seq("host_iowait_ticks" -> cpu(4), "host_total_ticks" -> cpu.sum,
        "host_steal_ticks" -> cpu(7))
    } catch { case _: Throwable =>
      Seq("host_iowait_ticks" -> -1L, "host_total_ticks" -> -1L,
        "host_steal_ticks" -> -1L) }
    self ++ host
  }

  def jsonObject(snap: Seq[(String, Long)]): String =
    snap.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
}
