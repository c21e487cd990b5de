package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Hash-min label propagation must produce the exact transitive
  * closure: min reachable id per node, every incident node labeled.
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chain, clique, and isolated pair resolve to min-id components") {
    // components: chain {1,2,3,4}, clique {10,11,12}, pair {20,21}
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L),          // chain 1-2-3-4
      (10L, 11L), (11L, 12L), (10L, 12L),    // triangle
      (21L, 20L)).toDF("a", "b")
    val got = ConnectedComponents.run(edges)
      .as[(Long, Long)].collect().toMap
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L)
    assert(got == want)
  }

  test("long chain converges within the iteration budget (diameter > 2 rounds)") {
    val n = 12L
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val got = ConnectedComponents.run(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == (1L to n).map(_ -> 1L).toMap)
  }

  test("empty edge list yields empty labeling") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.run(edges).count() == 0L)
    assert(ConnectedComponents.runAlternating(edges).count() == 0L)
  }

  test("alternating matches hash-min on chain, clique, and pair") {
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L), (30L, 30L)).toDF("a", "b")
    val viaMin = ConnectedComponents.run(edges)
      .as[(Long, Long)].collect().toMap
    val viaStar = ConnectedComponents.runAlternating(edges)
      .as[(Long, Long)].collect().toMap
    assert(viaStar == viaMin)
    assert(viaStar(30L) == 30L) // self-loop-only node still labeled
  }

  test("alternating labels a 512-link chain in O(log n) rounds") {
    // Worst case for hash-min (rounds = diameter = 511); the
    // star-alternation must stay logarithmic AND exact.
    val n = 512L
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) =
      ConnectedComponents.runAlternatingWithRounds(edges)
    assert(labels.as[(Long, Long)].collect().toMap ==
      (1L to n).map(_ -> 1L).toMap)
    assert(rounds <= 15, s"expected O(log n) rounds, got $rounds")
  }

  test("alternating matches hash-min on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .toDF("a", "b")
    val viaMin = ConnectedComponents.run(edges)
      .as[(Long, Long)].collect().toMap
    val viaStar = ConnectedComponents.runAlternating(edges)
      .as[(Long, Long)].collect().toMap
    assert(viaStar == viaMin)
  }
}
