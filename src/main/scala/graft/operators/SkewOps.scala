package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (the 100 TB failure mode AQE's skew-join handles only for
  * sort-merge shapes): salt the large side's hot keys across `salts`
  * sub-partitions and replicate the small side once per salt, turning
  * one straggler partition into `salts` parallel ones.
  *
  * The salt is derived deterministically from a caller-chosen
  * discriminator column (NOT rand() — results must be reproducible
  * and retry-safe under task re-execution).
  */
object SkewOps {

  /** Inner equi-join `large ⋈ small` on `key`, salted.
    *
    * @param discriminator a column on `large` that varies within a hot
    *                      key (e.g. a row id) — drives salt assignment
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      discriminator: String,
      salts: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(col(discriminator)), lit(salts.toLong)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
