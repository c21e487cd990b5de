package graft.operators

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DistributedRankSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("rowNumber equals the plain window rank exactly (total order)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val plain = li.withColumn("rn", row_number().over(w).cast("long"))
    val dist = DistributedRank.rowNumber(li,
      Seq("l_returnflag"),
      Seq("l_extendedprice", "l_orderkey", "l_linenumber"), "rn",
      numPartitions = 7) // deliberately odd so groups straddle partitions
    assert(dist.count() == li.count())
    assert(plain.exceptAll(dist).count() == 0 && dist.exceptAll(plain).count() == 0)
  }

  test("rowNumber == plain window on random data incl. empty groups, skew, and no groupCols") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      // skewed: 80% of rows in one group; values with deliberate ties
      val rows = Seq.tabulate(500 + rng.nextInt(500)) { i =>
        val g = if (rng.nextInt(5) > 0) "hot" else s"g${rng.nextInt(4)}"
        (g, rng.nextInt(20).toLong, i.toLong) // (group, value-with-ties, unique id)
      }
      val df = rows.toDF("g", "v", "id")
      val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
      val plain = df.withColumn("rn", row_number().over(w).cast("long"))
      val dist = DistributedRank.rowNumber(df, Seq("g"), Seq("v", "id"), "rn",
        numPartitions = 3 + trial)
      assert(plain.exceptAll(dist).count() == 0 && dist.exceptAll(plain).count() == 0,
        s"trial $trial mismatch")
      // groupless global rank
      val plainG = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      val distG = DistributedRank.rowNumber(df, Seq.empty, Seq("v", "id"), "rn",
        numPartitions = 5)
      assert(plainG.exceptAll(distG).count() == 0 && distG.exceptAll(plainG).count() == 0,
        s"trial $trial groupless mismatch")
    }
  }

  test("rowNumberAdaptive is identical either side of the threshold") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val rows = Seq.tabulate(700) { i =>
      val g = if (rng.nextInt(4) > 0) "hot" else s"g${rng.nextInt(3)}"
      (g, rng.nextInt(15).toLong, i.toLong)
    }
    val df = rows.toDF("g", "v", "id")
    for (groups <- Seq(Seq("g"), Seq.empty[String])) {
      // thresholdRows = 0 forces the distributed kernel, Long.MaxValue
      // the window path; totalRows pinned so dispatch never counts
      val viaWindow = DistributedRank.rowNumberAdaptive(
        df, groups, Seq("v", "id"), "rn",
        totalRows = rows.size.toLong, thresholdRows = Long.MaxValue)
      val viaKernel = DistributedRank.rowNumberAdaptive(
        df, groups, Seq("v", "id"), "rn",
        totalRows = rows.size.toLong, thresholdRows = 0L)
      assert(viaWindow.schema == viaKernel.schema,
        s"schema drift across the threshold for groups=$groups")
      assert(viaWindow.exceptAll(viaKernel).count() == 0 &&
        viaKernel.exceptAll(viaWindow).count() == 0,
        s"rank drift across the threshold for groups=$groups")
    }
  }

  test("valuesAtRanks returns exactly the window-ranked rows at each target") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val rows = Seq.tabulate(400 + rng.nextInt(400)) { i =>
        val g = if (rng.nextInt(5) > 0) "hot" else s"g${rng.nextInt(4)}"
        (g, rng.nextInt(20).toLong, i.toLong)
      }
      val df = rows.toDF("g", "v", "id")
      // median-straddling ranks, plus an out-of-range probe that must drop
      def ranks(n: Long): Seq[Long] = {
        val h = (n - 1) * 0.5
        Seq(math.floor(h).toLong + 1, math.ceil(h).toLong + 1, 1L, n, n + 7)
      }
      val got = DistributedRank.valuesAtRanks(df, Seq("g"), Seq("v", "id"),
        ranks, "rn", numPartitions = 3 + trial, outTotal = "n")
      val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
      val nPer = df.groupBy(col("g")).agg(count(lit(1)).as("n"))
      val expect = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .join(broadcast(nPer), "g")
        .as[(String, Long, Long, Long, Long)]
        .collect()
        .filter { case (_, _, _, rn, n) => ranks(n).filter(k => k >= 1 && k <= n).contains(rn) }
        .toSet
      val gotSet = got.select(col("g"), col("v"), col("id"), col("rn"), col("n"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(gotSet == expect, s"trial $trial valuesAtRanks mismatch")
      // exactly one row per surviving (group, target) — no dupes
      assert(got.count() == gotSet.size)
    }
  }

  test("runningSum equals the plain cumulative window, long and decimal, with nulls") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val rows = Seq.tabulate(700) { i =>
      val g = if (rng.nextInt(4) > 0) "hot" else s"g${rng.nextInt(3)}"
      val v: java.lang.Long = if (rng.nextInt(10) == 0) null else rng.nextInt(100).toLong
      (g, rng.nextInt(30).toLong, i.toLong, v)
    }
    val df = rows.toDF("g", "ord", "id", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("ord"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val plain = df.withColumn("cum", sum(col("v")).over(w))
    val dist = DistributedRank.runningSum(df, Seq("g"), Seq("ord", "id"), "v", "cum",
      numPartitions = 5)
    assert(plain.exceptAll(dist).count() == 0 && dist.exceptAll(plain).count() == 0)
    // decimal path (exact sums survive the driver prefix), groupless
    val ddf = df.withColumn("v", col("v").cast("decimal(12,2)"))
    val wg = Window.orderBy(col("ord"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val plainD = ddf.withColumn("cum", sum(col("v")).over(wg))
    val distD = DistributedRank.runningSum(ddf, Nil, Seq("ord", "id"), "v", "cum",
      numPartitions = 4)
    assert(plainD.exceptAll(distD).count() == 0 && distD.exceptAll(plainD).count() == 0)
    // double value columns are refused, not silently nondeterministic
    intercept[IllegalArgumentException] {
      DistributedRank.runningSum(df.withColumn("v", col("v").cast("double")),
        Seq("g"), Seq("ord", "id"), "v")
    }
    // outTotal carries the group's full sum on every row
    val withTot = DistributedRank.runningSum(df, Seq("g"), Seq("ord", "id"), "v", "cum",
      numPartitions = 5, outTotal = "tot")
    val expTot = df.groupBy(col("g")).agg(sum(col("v")).as("tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotTot = withTot.select(col("g"), col("tot")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotTot == expTot)
  }

  test("runningSumAdaptive is identical either side of the dispatch, all output columns") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val rows = Seq.tabulate(600) { i =>
      val g = if (rng.nextInt(4) > 0) "hot" else s"g${rng.nextInt(3)}"
      val v: java.lang.Long = if (rng.nextInt(10) == 0) null else rng.nextInt(100).toLong
      (g, rng.nextInt(30).toLong, i.toLong, v)
    }
    for (dec <- Seq(false, true); groups <- Seq(Seq("g"), Seq.empty[String])) {
      val base = rows.toDF("g", "ord", "id", "v")
      val df = if (dec) base.withColumn("v", col("v").cast("decimal(12,2)")) else base
      // maxBytes = 0 forces the kernel, Long.MaxValue the window path
      val viaWindow = DistributedRank.runningSumAdaptive(
        df, groups, Seq("ord", "id"), "v", "cum",
        outTotal = "tot", outRank = "rk", maxBytes = Long.MaxValue)
      val viaKernel = DistributedRank.runningSumAdaptive(
        df, groups, Seq("ord", "id"), "v", "cum",
        outTotal = "tot", outRank = "rk", maxBytes = 0L)
      assert(viaWindow.schema.map(f => (f.name, f.dataType)) ==
        viaKernel.schema.map(f => (f.name, f.dataType)),
        s"type drift across the dispatch for dec=$dec groups=$groups: " +
          s"${viaWindow.schema} vs ${viaKernel.schema}")
      assert(viaWindow.exceptAll(viaKernel).count() == 0 &&
        viaKernel.exceptAll(viaWindow).count() == 0,
        s"value drift across the dispatch for dec=$dec groups=$groups")
      graft.CacheScope.drain()
    }
    // all-null group: outTotal is 0 (not null) on both sides
    val nulls = Seq(("a", 1L, 1L, null: java.lang.Long),
      ("a", 2L, 2L, null: java.lang.Long)).toDF("g", "ord", "id", "v")
    for (mb <- Seq(Long.MaxValue, 0L)) {
      val r = DistributedRank.runningSumAdaptive(
          nulls, Seq("g"), Seq("ord", "id"), "v", "cum",
          outTotal = "tot", maxBytes = mb)
        .select(col("cum"), col("tot")).collect()
      assert(r.forall(x => x.isNullAt(0) && x.getLong(1) == 0L),
        s"all-null semantics drift at maxBytes=$mb: ${r.mkString}")
      graft.CacheScope.drain()
    }
  }

  test("runningSum outRank equals the plain window row_number") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val rows = Seq.tabulate(600) { i =>
      val g = if (rng.nextInt(4) > 0) "hot" else s"g${rng.nextInt(3)}"
      val v: java.lang.Long = if (rng.nextInt(10) == 0) null else rng.nextInt(100).toLong
      (g, rng.nextInt(30).toLong, i.toLong, v)
    }
    val df = rows.toDF("g", "ord", "id", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("ord"), col("id"))
    val plain = df
      .withColumn("cum", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rk", row_number().over(w).cast("long"))
    val dist = DistributedRank.runningSum(df, Seq("g"), Seq("ord", "id"), "v", "cum",
      numPartitions = 5, outRank = "rk")
    assert(plain.exceptAll(dist).count() == 0 && dist.exceptAll(plain).count() == 0)
  }

  test("runningMax equals the plain cumulative-max window, doubles and nulls, grouped and groupless") {
    import spark.implicits._
    val rng = new scala.util.Random(37)
    val rows = Seq.tabulate(600) { i =>
      val g = if (rng.nextInt(4) > 0) "hot" else s"g${rng.nextInt(3)}"
      val v: java.lang.Double =
        if (rng.nextInt(10) == 0) null else rng.nextDouble() * 100
      (g, rng.nextInt(30).toLong, i.toLong, v)
    }
    val df = rows.toDF("g", "ord", "id", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("ord"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val plain = df.withColumn("m", max(col("v")).over(w))
    val dist = DistributedRank.runningMax(df, Seq("g"), Seq("ord", "id"), "v", "m",
      numPartitions = 5)
    assert(plain.exceptAll(dist).count() == 0 && dist.exceptAll(plain).count() == 0)
    val wg = Window.orderBy(col("ord"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val plainG = df.withColumn("m", max(col("v")).over(wg))
    val distG = DistributedRank.runningMax(df, Nil, Seq("ord", "id"), "v", "m",
      numPartitions = 4)
    assert(plainG.exceptAll(distG).count() == 0 && distG.exceptAll(plainG).count() == 0)
    // exclusive form: 1-PRECEDING frame, null on each group's first row
    val wx = Window.partitionBy(col("g")).orderBy(col("ord"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val plainX = df.withColumn("m", max(col("v")).over(wx))
    val distX = DistributedRank.runningMax(df, Seq("g"), Seq("ord", "id"), "v", "m",
      numPartitions = 5, exclusive = true)
    assert(plainX.exceptAll(distX).count() == 0 && distX.exceptAll(plainX).count() == 0)
  }

  test("NULL group keys form their own group, matching PARTITION BY (no dropped rows)") {
    import spark.implicits._
    val rows = Seq.tabulate(300) { i =>
      val g: java.lang.Long = if (i % 4 == 0) null else (i % 3).toLong
      (g, (i % 17).toLong, i.toLong)
    }
    val df = rows.toDF("g", "v", "id")
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    // rowNumber
    val plainRn = df.withColumn("rn", row_number().over(w).cast("long"))
    val distRn = DistributedRank.rowNumber(df, Seq("g"), Seq("v", "id"), "rn",
      numPartitions = 5)
    assert(distRn.count() == 300) // no NULL-keyed rows dropped
    assert(plainRn.exceptAll(distRn).count() == 0 && distRn.exceptAll(plainRn).count() == 0)
    // runningSum
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val plainCum = df.withColumn("c", sum(col("v")).over(wr))
    val distCum = DistributedRank.runningSum(df, Seq("g"), Seq("v", "id"), "v", "c",
      numPartitions = 5)
    assert(plainCum.exceptAll(distCum).count() == 0 && distCum.exceptAll(plainCum).count() == 0)
    // runningMax
    val plainMax = df.withColumn("m", max(col("v")).over(wr))
    val distMax = DistributedRank.runningMax(df, Seq("g"), Seq("v", "id"), "v", "m",
      numPartitions = 5)
    assert(plainMax.exceptAll(distMax).count() == 0 && distMax.exceptAll(plainMax).count() == 0)
    // valuesAtRanks: the NULL group's median row must surface too
    val gotMed = DistributedRank.valuesAtRanks(df, Seq("g"), Seq("v", "id"),
      n => Seq((n + 1) / 2), "rn", numPartitions = 5)
    // expected via window count, NOT an equi-join on g (which would
    // itself drop the NULL group — the very bug under test)
    val expMed = plainRn
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .filter(col("rn") === ((col("n") + 1) / 2).cast("long"))
      .drop("n")
    assert(gotMed.count() == 4) // 3 non-null groups + the NULL group
    assert(expMed.exceptAll(gotMed).count() == 0 && gotMed.exceptAll(expMed).count() == 0)
  }

  test("maxDriverRows guard fails fast on high-cardinality groups") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (i, i)).toDF("g", "v") // ~2000 groups
    val e = intercept[IllegalArgumentException] {
      DistributedRank.rowNumber(df, Seq("g"), Seq("v"), "rn",
        numPartitions = 4, maxDriverRows = 64)
    }
    assert(e.getMessage.contains("cardinality"))
    val e2 = intercept[IllegalArgumentException] {
      DistributedRank.runningSum(df, Seq("g"), Seq("v"), "v", "c",
        numPartitions = 4, maxDriverRows = 64)
    }
    assert(e2.getMessage.contains("cardinality"))
    val e3 = intercept[IllegalArgumentException] {
      DistributedRank.valuesAtRanks(df, Seq("g"), Seq("v"), n => Seq(1L), "rn",
        numPartitions = 4, maxDriverRows = 64)
    }
    assert(e3.getMessage.contains("cardinality"))
    graft.CacheScope.drain() // release the scoped frames the aborted builds registered
  }

  test("window tier agrees with sort-selection and by-value on ties, nulls, and null groups") {
    import spark.implicits._
    val rng = new scala.util.Random(43)
    for (trial <- 1 to 3) {
      // same adversarial shape as the by-value test: heavy ties, a
      // null-valued block, and a NULL group key — the window tier
      // must produce the identical (g, v, rn, n) rows as both kernels
      val rows = Seq.tabulate(400 + rng.nextInt(300)) { i =>
        val g: java.lang.Long =
          if (i % 11 == 0) null else if (rng.nextInt(5) > 0) 0L else rng.nextInt(3).toLong + 1
        val v: java.lang.Long = if (rng.nextInt(9) == 0) null else rng.nextInt(12).toLong
        (g, v, i.toLong)
      }
      val df = rows.toDF("g", "v", "id")
      def ranks(n: Long): Seq[Long] = {
        val h = (n - 1) * 0.5
        Seq(1L, math.floor(h).toLong + 1, math.ceil(h).toLong + 1, n, n + 5)
      }
      // totalRows known and under the window bound → window tier
      val byWindow = DistributedRank.valuesAtRanksAdaptive(df, Seq("g"), "v", Seq("id"),
        ranks, "rn", outTotal = "n", totalRows = rows.size.toLong)
      // claimed rows past the window bound, under the threshold → sort-selection
      val bySort = DistributedRank.valuesAtRanksAdaptive(df, Seq("g"), "v", Seq("id"),
        ranks, "rn", outTotal = "n",
        totalRows = DistributedRank.WindowRankMaxRows + 1,
        thresholdRows = Long.MaxValue)
      // past the threshold → by-value
      val byValue = DistributedRank.valuesAtRanksAdaptive(df, Seq("g"), "v", Seq("id"),
        ranks, "rn", outTotal = "n", totalRows = rows.size.toLong, thresholdRows = 0L)
      for ((other, name) <- Seq(bySort -> "sort-selection", byValue -> "by-value")) {
        assert(byWindow.schema.map(f => (f.name, f.dataType)) ==
          other.schema.map(f => (f.name, f.dataType)),
          s"trial $trial schema drift window vs $name")
        assert(byWindow.exceptAll(other).count() == 0 &&
          other.exceptAll(byWindow).count() == 0,
          s"trial $trial row drift window vs $name")
      }
      graft.CacheScope.drain()
    }
  }

  test("valuesAtRanksByValue selects the same values as sort-selection on ties, nulls, and null groups") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      // heavy ties (value domain ~12 distinct), a null-valued block,
      // and a NULL group key — every edge both paths must agree on
      val rows = Seq.tabulate(500 + rng.nextInt(300)) { i =>
        val g: java.lang.Long =
          if (i % 11 == 0) null else if (rng.nextInt(5) > 0) 0L else rng.nextInt(3).toLong + 1
        val v: java.lang.Long = if (rng.nextInt(9) == 0) null else rng.nextInt(12).toLong
        (g, v, i.toLong)
      }
      val df = rows.toDF("g", "v", "id")
      def ranks(n: Long): Seq[Long] = {
        val h = (n - 1) * 0.5
        Seq(1L, math.floor(h).toLong + 1, math.ceil(h).toLong + 1, n, n + 5)
      }
      val bySort = DistributedRank.valuesAtRanks(df, Seq("g"), Seq("v", "id"),
          ranks, "rn", numPartitions = 3 + trial, outTotal = "n")
        .select(col("g"), col("v"), col("rn"), col("n"))
      val byValue = DistributedRank.valuesAtRanksByValue(df, Seq("g"), "v",
        ranks, "rn", outTotal = "n")
      assert(bySort.exceptAll(byValue).count() == 0 &&
        byValue.exceptAll(bySort).count() == 0, s"trial $trial grouped mismatch")
      // exactly one row per surviving (group, target)
      assert(byValue.count() == bySort.count(), s"trial $trial cardinality")
      // groupless
      val bySortG = DistributedRank.valuesAtRanks(df, Nil, Seq("v", "id"),
          ranks, "rn", numPartitions = 4, outTotal = "n")
        .select(col("v"), col("rn"), col("n"))
      val byValueG = DistributedRank.valuesAtRanksByValue(df, Nil, "v",
        ranks, "rn", outTotal = "n")
      assert(bySortG.exceptAll(byValueG).count() == 0 &&
        byValueG.exceptAll(bySortG).count() == 0, s"trial $trial groupless mismatch")
    }
    graft.CacheScope.drain()
  }

  test("valuesAtRanksAdaptive picks identical values either side of the threshold") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i % 5, i % 23, i)).toDF("g", "v", "id")
    def ranks(n: Long): Seq[Long] = Seq(1L, (n + 1) / 2, n)
    // totalRows passed explicitly: auto mode's stats shortcut would
    // (correctly) route any test-sized frame to the sort path
    val small = DistributedRank.valuesAtRanksAdaptive(df, Seq("g"), "v", Seq("id"),
      ranks, "rn", outTotal = "n", totalRows = 400L, thresholdRows = 1000000L)
    val large = DistributedRank.valuesAtRanksAdaptive(df, Seq("g"), "v", Seq("id"),
      ranks, "rn", outTotal = "n", totalRows = 400L, thresholdRows = 10L)
    // both sides share the uniform (g, v, rn, n) schema and the rows agree
    assert(small.columns.toSeq == Seq("g", "v", "rn", "n"))
    assert(large.columns.toSeq == Seq("g", "v", "rn", "n"))
    assert(small.exceptAll(large).count() == 0 && large.exceptAll(small).count() == 0)
    // the middle tier: a claimed row count past the window bound but
    // under the threshold routes to sort-selection — pin it against
    // the window tier (`small` above, 400 ≤ WindowRankMaxRows)
    val sortSel = DistributedRank.valuesAtRanksAdaptive(df, Seq("g"), "v", Seq("id"),
      ranks, "rn", outTotal = "n",
      totalRows = DistributedRank.WindowRankMaxRows + 1, thresholdRows = 1000000000L)
    assert(sortSel.columns.toSeq == Seq("g", "v", "rn", "n"))
    assert(small.exceptAll(sortSel).count() == 0 && sortSel.exceptAll(small).count() == 0)
    graft.CacheScope.drain()
  }

  test("fused value-domain MAD cascade matches the row-level two-pass cascade") {
    import spark.implicits._
    // the q95 shape: median of v per group, then median of |v − med|,
    // computed (a) as two row-level sort selections over the fact and
    // (b) as the fused cascade — one groupBy(g, v) count table, the
    // second stage's counts DERIVED from the first by arithmetic +
    // re-aggregation (valuesAtRanksFromCounts). Both must emit the
    // exact same interpolated doubles.
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(900) { i =>
      (i % 3, rng.nextInt(40).toDouble * 1.25, i.toLong)
    }
    val df = rows.toDF("g", "v", "id")
    def medianRanks(n: Long): Seq[Long] = {
      val h = (n - 1) * 0.5
      Seq(math.floor(h).toLong + 1, math.ceil(h).toLong + 1)
    }
    def interp(hits: org.apache.spark.sql.DataFrame, v: String, out: String) = {
      val h = (col("n") - 1).cast("double") * lit(0.5)
      val lo = min(when(col("rn") === floor(h).cast("long") + 1, col(v)))
      val hi = min(when(col("rn") === ceil(h).cast("long") + 1, col(v)))
      hits.groupBy(col("g")).agg((lo + (max(h) - floor(max(h))) * (hi - lo)).as(out))
    }
    // (a) row-level two-pass
    val medsA = interp(DistributedRank.valuesAtRanks(df, Seq("g"), Seq("v", "id"),
      medianRanks, "rn", outTotal = "n"), "v", "med")
    val devsA = df.join(broadcast(medsA), "g")
      .withColumn("dev", abs(col("v") - col("med")))
    val madsA = interp(DistributedRank.valuesAtRanks(devsA, Seq("g"), Seq("dev", "id"),
      medianRanks, "rn", outTotal = "n"), "dev", "mad")
    val a = medsA.join(madsA, "g").as[(Int, Double, Double)].collect().toSet
    graft.CacheScope.drain()
    // (b) fused value-domain cascade
    val vc = graft.CacheScope.scoped(
      df.groupBy(col("g"), col("v")).agg(count(lit(1)).as("__cnt")))
    val medsB = interp(DistributedRank.valuesAtRanksFromCounts(vc, Seq("g"), "v",
      "__cnt", medianRanks, "rn", outTotal = "n"), "v", "med")
    val vcDev = graft.CacheScope.scoped(
      vc.join(broadcast(medsB), "g")
        .select(col("g"), abs(col("v") - col("med")).as("dev"), col("__cnt"))
        .groupBy(col("g"), col("dev")).agg(sum(col("__cnt")).as("__cnt")))
    val madsB = interp(DistributedRank.valuesAtRanksFromCounts(vcDev, Seq("g"), "dev",
      "__cnt", medianRanks, "rn", outTotal = "n"), "dev", "mad")
    val b = medsB.join(madsB, "g").as[(Int, Double, Double)].collect().toSet
    graft.CacheScope.drain()
    assert(a == b)
    assert(a.size == 3)

    // (c) the medianMad kernel, BOTH tiers, pinned against (a): the
    // driver tier (count table collects under the bound) and the
    // distributed tier (bound forced below the ~120-row count table
    // but above every internal offset/total collect) must emit the
    // exact same interpolated doubles as the row-level cascade.
    val src = df.select(col("g"), col("v"))
    val cDriver = DistributedRank.medianMad(src, "g", "v")
      .as[(Int, Double, Double)].collect().toSet
    graft.CacheScope.drain()
    val cDist = DistributedRank.medianMad(src, "g", "v", maxDriverRows = 100)
      .as[(Int, Double, Double)].collect().toSet
    graft.CacheScope.drain()
    assert(cDriver == a)
    assert(cDist == a)
  }

  test("valuesAtRanksFromCounts: driver tier == distributed tier (nulls, long values)") {
    import spark.implicits._
    // long values + null values + a null group key; ranks at the
    // edges and middle. maxDriverRows=500 forces the distributed tier
    // (the ~2000-distinct-value probe overflows it) while every
    // internal collect of that tier — group totals, per-partition
    // offsets, targets — stays comfortably under it.
    val rng = new scala.util.Random(11)
    val df = Seq.tabulate(3000) { i =>
      (if (i % 7 == 0) None else Some(i % 3),
        if (i % 11 == 0) None else Some(rng.nextInt(5000).toLong))
    }.toDF("g", "v")
    val vc = graft.CacheScope.scoped(
      df.groupBy(col("g"), col("v")).agg(count(lit(1)).as("__cnt")))
    def ranks(n: Long): Seq[Long] = Seq(1L, (n + 1) / 2, n)
    val viaDriver = DistributedRank.valuesAtRanksFromCounts(vc, Seq("g"), "v",
      "__cnt", ranks, "rn", outTotal = "n")
      .collect().map(_.toSeq).toSet
    val viaDist = DistributedRank.valuesAtRanksFromCounts(vc, Seq("g"), "v",
      "__cnt", ranks, "rn", outTotal = "n", maxDriverRows = 500)
      .collect().map(_.toSeq).toSet
    graft.CacheScope.drain()
    assert(viaDriver.nonEmpty)
    assert(viaDriver == viaDist)
  }

  test("weightedMedian: driver tier == distributed tier == window form (decimal weights, ties)") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val rows = Seq.tabulate(400) { i =>
      (i % 3, (rng.nextInt(50) * 0.5), BigDecimal(rng.nextInt(9) + 1).setScale(2))
    }
    val w = rows.toDF("g", "v", "q")
      .groupBy(col("g"), col("v"))
      .agg(sum(col("q").cast(org.apache.spark.sql.types.DecimalType(12, 2))).as("w"))
      .persist()
    // reference: the plain window crossing
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("v").rowsBetween(Long.MinValue, 0)
    val tot = w.groupBy("g").agg(sum("w").as("tw"))
    val want = w.withColumn("cw", sum("w").over(win))
      .join(tot, "g")
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy("g").agg(min("v").as("wmedian"))
      .as[(Int, Double)].collect().toSet
    val viaDriver = DistributedRank.weightedMedian(w, Seq("g"), "v", "w")
      .as[(Int, Double)].collect().toSet
    // bound chosen to overflow the ~150-row table probe while every
    // internal collect of the distributed tier (≤ 96 per-partition
    // offset rows, 3 totals) stays under it
    val viaDist = DistributedRank.weightedMedian(w, Seq("g"), "v", "w",
      maxDriverRows = 100)
      .as[(Int, Double)].collect().toSet
    w.unpersist()
    graft.CacheScope.drain()
    assert(viaDriver == want)
    assert(viaDist == want)
  }

  test("medianMad driver tier: null values rank first, null group is its own group") {
    import spark.implicits._
    // null-heavy group x: median lands on nulls -> null med/mad; group
    // y: clean odd count; the null GROUP gets its own row
    val df = Seq[(Option[String], Option[Double])](
      (Some("x"), None), (Some("x"), None), (Some("x"), None),
      (Some("x"), Some(4.0)),
      (Some("y"), Some(1.0)), (Some("y"), Some(5.0)), (Some("y"), Some(9.0)),
      (None, Some(2.0)), (None, Some(4.0)))
      .toDF("g", "v")
    val got = DistributedRank.medianMad(df, "g", "v")
      .as[(Option[String], Option[Double], Option[Double])].collect().toSet
    graft.CacheScope.drain()
    assert(got == Set(
      (Some("x"), None, None),
      (Some("y"), Some(5.0), Some(4.0)),
      (None, Some(3.0), Some(1.0))))
  }

  test("valuesAtRanks handles the groupless global-quantile shape") {
    import spark.implicits._
    val df = (1L to 101L).map(i => (i % 13, i)).toDF("v", "id")
    val got = DistributedRank.valuesAtRanks(df, Seq.empty, Seq("v", "id"),
      n => Seq(1L, (n + 1) / 2, n), "rn", numPartitions = 5, outTotal = "n")
      .as[(Long, Long, Long, Long)].collect().toSet
    val sorted = (1L to 101L).map(i => (i % 13, i)).sortBy(identity)
    val expect = Set(1L, 51L, 101L).map { k =>
      (sorted(k.toInt - 1)._1, sorted(k.toInt - 1)._2, k, 101L)
    }
    assert(got == expect)
  }
}
