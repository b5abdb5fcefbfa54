package graft

import scala.util.Random

import graft.operators.Clustering

/** Connected-components correctness: large-star/small-star vs a
  * brute-force union-find on seeded random graphs, plus the adversarial
  * shapes (long chains, stars, isolated nodes).
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(i => i)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to roots
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  /** Both physical paths must give identical answers: the single-task
    * union-find (default below the small-graph cap) and the iterative
    * star loop (forced by cap=0 — the shape that runs at 10^10 edges).
    */
  private def check(n: Int, edges: Seq[(Long, Long)]): Unit = {
    val want = bruteForce(n, edges)
    val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
    for (cap <- Seq(200000L, 0L)) {
      val got = Clustering.connectedComponents(
        edges.toDF("src", "dst"), "src", "dst", smallGraphEdgeCap = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      touched.foreach { v =>
        assert(got(v) === want(v),
          s"node $v (cap=$cap): got ${got.get(v)}, want ${want(v)}")
      }
    }
  }

  test("long chain collapses to one component (diameter >> rounds)") {
    val chain = (0L until 200L).sliding(2).map(s => (s(0), s(1))).toSeq
    check(200, chain)
  }

  test("random graphs match union-find ground truth") {
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val n = 120
      val m = 80 + trial * 40
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      check(n, edges)
    }
  }

  test("clusterAll assigns singletons to themselves") {
    val vertices = (0L until 10L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("src", "dst")
    val got = Clustering.clusterAll(vertices, "id", edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) === 0L && got(1L) === 0L && got(2L) === 0L)
    assert(got(5L) === 5L && got(6L) === 5L)
    Seq(3L, 4L, 7L, 8L, 9L).foreach(v => assert(got(v) === v))
  }

  test("string-typed node ids work (url clustering)") {
    val edges = Seq(("u/a", "u/b"), ("u/b", "u/c"), ("u/x", "u/y"))
      .toDF("src", "dst")
    val got = Clustering.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("u/a") === "u/a" && got("u/b") === "u/a" && got("u/c") === "u/a")
    assert(got("u/x") === "u/x" && got("u/y") === "u/x")
  }

  test("star loop on string keys dictionary-encodes and decodes to min-url roots") {
    // cap=0 forces the iterative path, which for non-numeric keys runs on
    // rank-correlated long ids; decoded roots must be the component's
    // MINIMUM url, including across a chain (where the min sits mid-chain
    // lexicographically) and with ids that would sort differently as
    // strings vs insertion order
    val edges = Seq(
      ("u/m", "u/b"), ("u/b", "u/z"),       // chain, min u/b in the middle
      ("u/10", "u/2"), ("u/2", "u/1"),      // lexicographic: "u/1" < "u/10" < "u/2"
      ("u/solo1", "u/solo2"))
      .toDF("src", "dst")
    val got = Clustering.connectedComponents(
      edges, "src", "dst", smallGraphEdgeCap = 0L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("u/m") === "u/b" && got("u/b") === "u/b" && got("u/z") === "u/b")
    assert(got("u/10") === "u/1" && got("u/2") === "u/1" && got("u/1") === "u/1")
    assert(got("u/solo1") === "u/solo1" && got("u/solo2") === "u/solo1")
  }
}
