package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{Normalize, Similarity}

/** The driver-facing query catalog: every implemented operator from
  * SURVEY.md par.2 is exposed as a named query over the /root/testdata
  * tables, with a DuckDB-equivalent oracle SQL where the semantics are
  * ANSI-SQL-expressible. Column names/aliases are kept identical between
  * the Spark plan and the oracle (the driver sorts columns by name and
  * hashes values). All floating outputs are rounded to tame engine-order
  * float drift.
  */
object Catalog {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ---------------------------------------------------------------------
  // Relational core (SURVEY.md par.2.1-2.7)
  // ---------------------------------------------------------------------

  /** A1/A6-style grouped aggregation with map-side partial agg (TPC-H Q1
    * shape). Filter + projection push down to the parquet scan.
    */
  val qAggSum: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n"))

  val qAggSumSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** P4/P11: predicate + column pruning, both pushed to the scan. */
  val qFilterProject: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp")
        && col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_returnflag")

  val qFilterProjectSql: String =
    """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 45""".stripMargin

  /** J2-style equi join; the dimension side is explicitly broadcast —
    * at 100 TB the fact side never shuffles for this join.
    */
  val qJoinAgg: Q = (s, dir) =>
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(round(sum("o_totalprice"), 2).as("total"), count(lit(1)).as("n"))

  val qJoinAggSql: String =
    """SELECT c_mktsegment, round(sum(o_totalprice), 2) AS total, count(*) AS n
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  /** Multi-join over the dimension chain (all broadcastable). */
  val qMultiJoin: Q = (s, dir) =>
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_suppliers"), round(avg("s_acctbal"), 2).as("avg_bal"))

  val qMultiJoinSql: String =
    """SELECT r_name, count(*) AS n_suppliers, round(avg(s_acctbal), 2) AS avg_bal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  /** O4/W1: deterministic top-k per group via row_number (unique tiebreak). */
  val qWindowTopk: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
  }

  val qWindowTopkSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) WHERE rk <= 3""".stripMargin

  /** U1 + distinct: unionByName of two filtered branches. */
  val qUnionDistinct: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    c.filter(col("c_mktsegment") === "BUILDING").select("c_nationkey")
      .unionByName(c.filter(col("c_acctbal") > 9000).select("c_nationkey"))
      .distinct()
  }

  val qUnionDistinctSql: String =
    """SELECT DISTINCT c_nationkey FROM (
      |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  UNION ALL
      |  SELECT c_nationkey FROM customer WHERE c_acctbal > 9000)""".stripMargin

  /** O2: ORDER BY + LIMIT with a unique tiebreak key (deterministic set). */
  val qOrderbyLimit: Q = (s, dir) =>
    t(s, dir, "events")
      .orderBy(col("ts"), col("event_id"))
      .limit(100)
      .select("event_id", "ts", "event_type")

  val qOrderbyLimitSql: String =
    "SELECT event_id, ts, event_type FROM events ORDER BY ts, event_id LIMIT 100"

  /** J5: left_anti join — customers with no high-value order
    * (the invalid-cache skip pattern, idrt/algorithm/prepare_data.py:81-86).
    */
  val qAntiJoin: Q = (s, dir) =>
    t(s, dir, "customer")
      .join(
        t(s, dir, "orders").filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  val qAntiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin

  // ---------------------------------------------------------------------
  // Incremental semantics (SURVEY.md par.2.10: I1/I2, P6/P7) and upsert (S6)
  // ---------------------------------------------------------------------

  /** P6/I1: the reference's "stale rows" predicate — rows absent from the
    * processed output or updated since last processing get recomputed
    * (reference: idrt/algorithm/prepare_data.py:67-77). The processed side
    * is derived deterministically from events itself.
    */
  val qIncrementalStale: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    val processed = ev.filter(col("event_id") % 3 === 0)
      .select(col("event_id").as("p_event_id"),
        when(col("user_id") < 50, col("ts") + expr("INTERVAL 1 HOUR"))
          .otherwise(col("ts") - expr("INTERVAL 1 HOUR")).as("processed_ts"))
    ev.join(processed, col("event_id") === col("p_event_id"), "left")
      .filter(col("p_event_id").isNull || col("ts") > col("processed_ts"))
      .select("event_id", "user_id")
  }

  val qIncrementalStaleSql: String =
    """SELECT e.event_id, e.user_id FROM events e
      |LEFT JOIN (
      |  SELECT event_id AS p_event_id,
      |    CASE WHEN user_id < 50 THEN ts + INTERVAL 1 HOUR
      |         ELSE ts - INTERVAL 1 HOUR END AS processed_ts
      |  FROM events WHERE event_id % 3 = 0) p
      |ON e.event_id = p.p_event_id
      |WHERE p.p_event_id IS NULL OR e.ts > p.processed_ts""".stripMargin

  /** S6: MERGE-equivalent upsert — target rows not superseded, plus all
    * updates (reference: idrt/algorithm/database_adapter.py:59-73).
    */
  val qMergeUpsert: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    val target = ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), round(col("value"), 2).as("value"))
    val updates = ev.filter(col("event_id") % 4 === 0)
      .select(col("event_id"), round(col("value") * 2, 2).as("value"))
    target.join(updates, Seq("event_id"), "left_anti").unionByName(updates)
  }

  val qMergeUpsertSql: String =
    """SELECT t.event_id, t.value FROM
      |  (SELECT event_id, round(value, 2) AS value FROM events WHERE event_id % 2 = 0) t
      |WHERE t.event_id NOT IN (SELECT event_id FROM events WHERE event_id % 4 = 0)
      |UNION ALL
      |SELECT event_id, round(value * 2, 2) AS value FROM events WHERE event_id % 4 = 0""".stripMargin

  // ---------------------------------------------------------------------
  // ER pipeline operators over documents (SURVEY.md par.2.2, 2.8, 2.9)
  // ---------------------------------------------------------------------

  /** P1/F1-F5: the canonical normalizing projection (lower, coalesce,
    * concat_ws, substring) — the byte-identical invariant, par.1.6 steps 2-4.
    */
  val erNormalize: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        col("lang"),
        Normalize.normalizeField(Seq(col("text")), 80).as("text_norm"),
        Normalize.nonPadLength(Normalize.normalizeField(Seq(col("text")), 80)).as("norm_len"))

  val erNormalizeSql: String =
    """SELECT doc_id, lang,
      |  substring(lower(coalesce(text, '')), 1, 80) AS text_norm,
      |  length(substring(lower(coalesce(text, '')), 1, 80)) AS norm_len
      |FROM documents""".stripMargin

  /** P5: vocabulary validity gate (printable ASCII), counted per lang
    * (reference: idrt/data.py:175-189).
    */
  val erValiditySplit: Q = (s, dir) =>
    t(s, dir, "documents")
      .groupBy("lang")
      .agg(
        sum(when(Normalize.isValidText(col("text")), 1L).otherwise(0L)).as("n_valid"),
        sum(when(Normalize.isValidText(col("text")), 0L).otherwise(1L)).as("n_invalid"))

  val erValiditySplitSql: String =
    """SELECT lang,
      |  sum(CASE WHEN regexp_full_match(coalesce(text, ''), '[\x20-\x7E\t\n\r\x0B\x0C]*') THEN 1 ELSE 0 END) AS n_valid,
      |  sum(CASE WHEN regexp_full_match(coalesce(text, ''), '[\x20-\x7E\t\n\r\x0B\x0C]*') THEN 0 ELSE 1 END) AS n_invalid
      |FROM documents GROUP BY lang""".stripMargin

  /** F16/J4: order-insensitive pair canonicalization with least/greatest,
    * then groupBy-min dedup (A8) — replaces the reference's O(n*m) OR-join
    * (idrt/algorithm/run_search.py:417-428) with an equi-joinable key.
    */
  val erPairCanonical: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    val pairs = ev.select(
      col("user_id").as("u"),
      (col("event_id") % 97).as("v"),
      round(col("value"), 2).as("d"))
    pairs.select(
      least(col("u"), col("v")).as("k1"),
      greatest(col("u"), col("v")).as("k2"),
      col("d"))
      .groupBy("k1", "k2")
      .agg(min("d").as("min_d"))
  }

  val erPairCanonicalSql: String =
    """SELECT least(user_id, event_id % 97) AS k1,
      |       greatest(user_id, event_id % 97) AS k2,
      |       min(round(value, 2)) AS min_d
      |FROM events GROUP BY 1, 2""".stripMargin

  /** The flagship slice (SURVEY.md par.7.2 step 3): normalize -> block on
    * (lang, source) -> in-block self-join with doc_id1 < doc_id2 (G1
    * Unpooled semantics + G3 corrected self-pair handling) -> Jaro-Winkler
    * + normalized-Levenshtein score (M2 replacement) -> matches threshold
    * (P9). The self-join key is the block, so the shuffle is by block key
    * and each block's pairs are generated locally — the quadratic blowup is
    * bounded by block size, which the full pipeline caps + salts.
    */
  val erBlockingPairs: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
      .select(
        col("doc_id"),
        col("lang"),
        col("source"),
        Normalize.normalizeField(Seq(col("text")), 60).as("text_norm"))
    val lhs = docs.select(
      col("lang"), col("source"),
      col("doc_id").as("doc_id1"), col("text_norm").as("t1"))
    val rhs = docs.select(
      col("lang"), col("source"),
      col("doc_id").as("doc_id2"), col("text_norm").as("t2"))
    val jw = Similarity.jaroWinkler(col("t1"), col("t2"))
    val lev = Similarity.levenshteinSim(col("t1"), col("t2"))
    lhs.join(rhs, Seq("lang", "source"))
      .filter(col("doc_id1") < col("doc_id2"))
      .select(
        col("doc_id1"), col("doc_id2"),
        round((jw * 0.5 + lev * 0.5), 4).as("score"))
      .withColumn("matches", col("score") >= 0.75)
  }

  val erBlockingPairsSql: String =
    """WITH docs AS (
      |  SELECT doc_id, lang, source,
      |    substring(lower(coalesce(text, '')), 1, 60) AS text_norm
      |  FROM documents)
      |SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
      |  round(0.5 * jaro_winkler_similarity(a.text_norm, b.text_norm)
      |    + 0.5 * (CASE WHEN greatest(length(a.text_norm), length(b.text_norm)) = 0
      |             THEN 1.0
      |             ELSE 1.0 - levenshtein(a.text_norm, b.text_norm)
      |                  / CAST(greatest(length(a.text_norm), length(b.text_norm)) AS DOUBLE) END),
      |    4) AS score,
      |  (round(0.5 * jaro_winkler_similarity(a.text_norm, b.text_norm)
      |    + 0.5 * (CASE WHEN greatest(length(a.text_norm), length(b.text_norm)) = 0
      |             THEN 1.0
      |             ELSE 1.0 - levenshtein(a.text_norm, b.text_norm)
      |                  / CAST(greatest(length(a.text_norm), length(b.text_norm)) AS DOUBLE) END),
      |    4) >= 0.75) AS matches
      |FROM docs a JOIN docs b
      |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q_agg_sum" -> qAggSum,
    "q_filter_project" -> qFilterProject,
    "q_join_agg" -> qJoinAgg,
    "q_multi_join" -> qMultiJoin,
    "q_window_topk" -> qWindowTopk,
    "q_union_distinct" -> qUnionDistinct,
    "q_orderby_limit" -> qOrderbyLimit,
    "q_anti_join" -> qAntiJoin,
    "q_incremental_stale" -> qIncrementalStale,
    "q_merge_upsert" -> qMergeUpsert,
    "er_normalize" -> erNormalize,
    "er_validity_split" -> erValiditySplit,
    "er_pair_canonical" -> erPairCanonical,
    "er_blocking_pairs" -> erBlockingPairs,
  )

  val oracleSql: Map[String, String] = Map(
    "q_agg_sum" -> qAggSumSql,
    "q_filter_project" -> qFilterProjectSql,
    "q_join_agg" -> qJoinAggSql,
    "q_multi_join" -> qMultiJoinSql,
    "q_window_topk" -> qWindowTopkSql,
    "q_union_distinct" -> qUnionDistinctSql,
    "q_orderby_limit" -> qOrderbyLimitSql,
    "q_anti_join" -> qAntiJoinSql,
    "q_incremental_stale" -> qIncrementalStaleSql,
    "q_merge_upsert" -> qMergeUpsertSql,
    "er_normalize" -> erNormalizeSql,
    "er_validity_split" -> erValiditySplitSql,
    "er_pair_canonical" -> erPairCanonicalSql,
    "er_blocking_pairs" -> erBlockingPairsSql,
  )
}
