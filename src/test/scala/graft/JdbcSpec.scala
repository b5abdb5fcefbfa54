package graft

import org.apache.spark.sql.functions._

import graft.sources.JdbcStore

/** JDBC source/sink semantics against embedded Derby — the reference's
  * DatabaseAdapter surface (database_adapter.py:10-89): upsert replaces
  * matched keys and inserts new ones atomically, bulk append appends,
  * filtered reads push the predicate into the database, table probes work.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = JdbcStore.derbyUrl(s"spec_${System.nanoTime()}")
  private val types = Some("id BIGINT, name VARCHAR(64)")

  test("upsert: updates replace matched keys, new keys insert (S6)") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
    JdbcStore.overwrite(base, url, "contacts", types)
    val updates = Seq((2L, "B"), (4L, "D")).toDF("id", "name")
    JdbcStore.upsert(spark, updates, url, "contacts", Seq("id"), types)
    val got = JdbcStore.read(spark, url, "contacts")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D")))
    // staging table (unique name per call) is cleaned up after the txn
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "CONTACTS_STG_%", null)
      try assert(!rs.next(), "stranded staging table") finally rs.close()
    } finally conn.close()
  }

  test("upsert is idempotent (same batch twice -> same table)") {
    val updates = Seq((2L, "B"), (4L, "D")).toDF("id", "name")
    JdbcStore.upsert(spark, updates, url, "contacts", Seq("id"), types)
    val got = JdbcStore.read(spark, url, "contacts").count()
    assert(got === 4)
  }

  test("bulk append adds rows without touching existing ones (S7)") {
    JdbcStore.append(Seq((5L, "e")).toDF("id", "name"), url, "contacts", types)
    val got = JdbcStore.read(spark, url, "contacts")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.contains((5L, "e")) && got.size === 5)
  }

  test("filtered read ships the predicate to the database (S4)") {
    val got = JdbcStore.readWhere(spark, url, "contacts", "\"id\" >= 4")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(4L, 5L))
    // Catalyst-side filters also push down into the JDBC scan
    val plan = JdbcStore.read(spark, url, "contacts").filter(col("id") > 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"), plan.take(400))
  }

  test("table-exists probe (S8)") {
    assert(JdbcStore.tableExists(url, "contacts"))
    assert(!JdbcStore.tableExists(url, "no_such_table"))
  }

  test("partition-parallel read covers all rows exactly once") {
    val got = JdbcStore.readPartitioned(spark, url, "contacts", "\"id\"",
      lower = 1L, upper = 6L, numPartitions = 3)
    assert(got.rdd.getNumPartitions === 3)
    val ids = got.collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L, 4L, 5L), s"range slicing lost/duplicated rows: $ids")
  }
}
