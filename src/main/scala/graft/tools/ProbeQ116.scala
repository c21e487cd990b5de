package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Throwaway stage-timing probe comparing q116 candidate plans. */
object ProbeQ116 {
  def main(a: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val dir = a(0)
    def t[T](n:String)(f: => T): T = { val t0=System.nanoTime; val r=f; println(f"$n%-18s ${(System.nanoTime-t0)/1e9}%.2f s"); r }
    t("warmup"){ s.range(1000000).selectExpr("sum(id)").collect() }
    val k = 16
    def ranksOf(n: Long): Seq[Long] = {
      val q=n/k; val r=n%k
      val ends=(1L to k).map(i=>if(i<=r) i*(q+1) else r*(q+1)+(i-r)*q)
      (ends ++ (1L +: ends.init.map(_+1))).filter(x => x>=1 && x<=n).distinct
    }
    // Path A: value-domain (groupBy v + runningSum + bnlj)
    t("A total"){
      val vc = graft.CacheScope.scoped(s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_extendedprice").as("v")).groupBy(col("v")).agg(count(lit(1)).as("cnt")))
      val cum = graft.operators.DistributedRank.runningSum(vc, Nil, Seq("v"), "cnt", "cume")
      val n = vc.agg(sum(col("cnt"))).first().getLong(0)
      val tdf = ranksOf(n).toDF("t")
      val hits = cum.join(broadcast(tdf),
        col("t") > col("cume")-col("cnt") && col("t") <= col("cume"))
        .select("v","cnt","cume").collect()
      println("  n=" + n + " hits=" + hits.length)
      graft.CacheScope.drain()
    }
    // Path B: 1-col valuesAtRanks
    t("B total"){
      val li = s.read.parquet(s"$dir/lineitem.parquet").select(col("l_extendedprice").as("v"))
      val hits = graft.operators.DistributedRank.valuesAtRanks(li, Nil, Seq("v"), ranksOf, "rn", outTotal="tot")
        .select("rn","v","tot").collect()
      println("  hits=" + hits.length)
      graft.CacheScope.drain()
    }
    s.stop()
  }
}
