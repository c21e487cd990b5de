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
      "rdd_blocks" -> rddBlocks.toLong,
      "broadcast_blocks" -> bcBlocks.toLong,
      "other_blocks" -> otherBlocks.toLong)
  }

  def jsonObject(snap: Seq[(String, Long)]): String =
    snap.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
}
