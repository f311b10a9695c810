package graft

import scala.util.Random
import graft.operators.ConnectedComponents

/** ConnectedComponents vs a driver-side union-find oracle on adversarial
  * graph shapes — including the long chains that plain diameter-bound
  * label propagation would get wrong without enough rounds. */
class ConnectedComponentsSpec extends SparkSpec {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-id per root, then map every touched vertex to it
    val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val minOfRoot = touched.groupBy(v => find(v.toInt))
      .map { case (r, vs) => r -> vs.min }
    touched.map(v => v -> minOfRoot(find(v.toInt))).toMap
  }

  private def check(n: Int, edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val got = ConnectedComponents.run(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = unionFind(n, edges)
    assert(got == want,
      s"mismatch: ${(got.toSet diff want.toSet).take(5)} vs " +
        s"${(want.toSet diff got.toSet).take(5)}")
  }

  test("long chain (diameter 199) resolves to one component") {
    check(200, (0L until 199L).map(i => (i, i + 1)))
  }

  test("two chains + a clique + isolated pair") {
    val chainA = (0L until 50L).map(i => (i, i + 1))
    val chainB = (100L until 140L).map(i => (i + 1, i)) // reversed edges
    val clique = for (a <- 200L until 210L; b <- (a + 1) until 210L)
      yield (b, a)
    val pair = Seq((300L, 301L))
    check(302, chainA ++ chainB ++ clique ++ pair)
  }

  test("random sparse graphs match union-find (3 seeds)") {
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val n = 150
      val edges = Seq.fill(120)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      check(n, edges)
    }
  }

  test("self-loops and duplicate edges are tolerated") {
    check(10, Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (5L, 5L), (3L, 4L)))
  }
}
