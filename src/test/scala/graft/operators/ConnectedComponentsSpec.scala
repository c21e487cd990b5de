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
  }
}
