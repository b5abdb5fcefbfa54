package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Transitive closure / entity clustering — NEW vs the reference (the
  * reference stops at the pair table, idrt/algorithm/run_search.py:524-536;
  * the north rule adds clustering).
  *
  * Implementation: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — converges in
  * O(log^2 n) rounds independent of component diameter, unlike naive
  * min-label propagation which needs O(diameter) rounds and dies on the
  * long chains duplicate records form (a-b-c-... name-typo chains).
  *
  * Scale notes: each star is expressed as groupBy-min + an equi join back
  * to the edge list — never collect_list, so a super-node (a hot cluster
  * with millions of members) stays distributed across partitions. Rounds
  * are localCheckpoint'ed to cut lineage (SURVEY.md par.7.4).
  */
object Clustering {

  /** edges: two columns (src, dst) of any orderable type. Returns
    * (node, cluster_id) where cluster_id = min node id in the component.
    * Isolated nodes (absent from edges) are the caller's concern — see
    * clusterAll.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxIter: Int = 50,
      rowsPerPartition: Long = 2000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // canonical undirected edge set (u < v), self-loops dropped
    var e = edges
      .select(col(srcCol).as("s"), col(dstCol).as("d"))
      .filter($"s" =!= $"d")
      .select(least($"s", $"d").as("u"), greatest($"s", $"d").as("v"))
      .distinct()
      .localCheckpoint(true)

    // order-insensitive edge-set signature: (count, xor of row hashes).
    // One cheap agg job replaces count+count+anti-join per round; a false
    // fixpoint needs a 128-bit collision — negligible vs iteration cost.
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(bit_xor(xxhash64($"u", $"v")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var prevSig = sig(e)
    // Size the loop's shuffle width from the MEASURED edge count (free —
    // the signature already counted): an iterative algorithm pays per-
    // round fixed cost proportional to task count, so a 10k-edge graph on
    // 32-wide shuffles spends more on task churn than on data (measured
    // ~2x on sf0.1), while a 10^10-edge graph needs thousands of
    // partitions regardless of the session default. The width lives in an
    // ISOLATED child session (newSession shares the SparkContext but owns
    // its SQLConf), so concurrent queries on the caller's session never
    // observe it — the checkpointed edge RDD rebases across sessions for
    // free.
    val sessionShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val p = math.max(1L, math.min(prevSig._1 / rowsPerPartition + 1, 20000L))
    val width = if (prevSig._1 < rowsPerPartition)
      math.min(sessionShuffle.toLong, math.max(1L, prevSig._1 / 50000L + 1L))
    else math.max(p, spark.sparkContext.defaultParallelism.toLong)
    val loopSession = spark.newSession()
    loopSession.conf.set("spark.sql.shuffle.partitions", width.toString)
    e = loopSession.createDataFrame(e.rdd, e.schema)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // --- large-star: for each node x, attach every strictly-larger
      // neighbor to m(x) = min(N(x) u {x}).
      val nbrs = e.select($"u".as("x"), $"v".as("y"))
        .unionAll(e.select($"v".as("x"), $"u".as("y")))
      val mins = nbrs.groupBy($"x").agg(min($"y").as("mn"))
        .select($"x", least($"x", $"mn").as("m"))
      val large = nbrs.join(mins, "x")
        .filter($"y" > $"x")
        .select($"m".as("u"), $"y".as("v")) // m <= x < y
        .distinct()

      // --- small-star: group canonical edges by the larger endpoint v;
      // m = min of its smaller neighbors; attach v and every non-min
      // smaller neighbor to m.
      val mins2 = large.groupBy($"v").agg(min($"u").as("m"))
      val attachNeighbors = large.join(mins2, "v")
        .filter($"u" =!= $"m")
        .select($"m".as("u"), $"u".as("v"))
      val attachCenter = mins2.select($"m".as("u"), $"v")
      val small = attachNeighbors.unionByName(attachCenter).distinct()

      // 1 job per round: a LAZY localCheckpoint materializes inside the
      // signature agg's action, so lineage cut + convergence check share
      // one job (round latency, not data volume, dominates small inputs)
      val checkpointed = small.localCheckpoint(false)
      val s = sig(checkpointed)
      e = checkpointed
      converged = s == prevSig
      prevSig = s
      iter += 1
    }

    // fixpoint edge set is a star forest rooted at the component minimum
    val members = e.select($"v".as("node"), $"u".as("cluster_id"))
    val roots = e.select($"u".as("node")).distinct()
      .withColumn("cluster_id", $"node")
    // materialize under the loop session (its width), then rebase the
    // result back onto the caller's session
    val res = members.unionByName(roots)
      .groupBy($"node").agg(min($"cluster_id").as("cluster_id"))
      .localCheckpoint(true)
    spark.createDataFrame(res.rdd, res.schema)
  }

  /** CC including isolated vertices: every row of `vertices` gets a
    * cluster id (its own id when unmatched).
    */
  def clusterAll(
      vertices: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val cc = connectedComponents(edges, srcCol, dstCol)
    vertices.select(col(idCol).as("node"))
      .join(cc, Seq("node"), "left")
      .select(col("node").as(idCol),
        coalesce(col("cluster_id"), col("node")).as("cluster_id"))
  }
}
