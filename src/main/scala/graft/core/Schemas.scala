package graft.core

/** Small filesystem helpers shared by operators/tests. */
object Fs {
  /** Recursive delete with the walk stream closed (Files.walk leaks a
    * directory handle if the stream is abandoned).
    */
  def deleteRecursively(dir: java.nio.file.Path): Unit = {
    if (!java.nio.file.Files.exists(dir)) return
    val walk = java.nio.file.Files.walk(dir)
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }
}

/** Shared partitioning helpers. */
object Par {
  /** Explicit width for exchanges feeding pair-exploding or per-row-heavy
    * compute (block self-joins, edit-distance verifies, media decodes).
    * AQE coalescing sizes post-shuffle partitions by MAP-side bytes, but
    * these operators multiply work downstream of the exchange, so the
    * advisory target collapses a kilobyte-scale probe side to ONE
    * partition and serializes the scan (measured round 6:
    * er_blocking_pairs ran 6.9 of 7.2 s in a single task). An explicit
    * count opts the exchange out of coalescing; the width follows the
    * scheduler: defaultParallelism tracks total cluster cores at any
    * scale, which is the right width for COMPUTE-bound scans (their
    * throughput scales with cores, not with shuffle fan-out) — never a
    * local constant. Deliberately NOT spark.sql.shuffle.partitions: an
    * explicit width is exempt from AQE coalescing, so inheriting a large
    * shuffle width here would schedule thousands of near-empty tasks
    * (measured: a 1024-partition session turned the 5 s candidates stage
    * into 21 s of task churn).
    */
  def spread(s: org.apache.spark.sql.SparkSession): Int =
    math.max(1, s.sparkContext.defaultParallelism)
}

import java.sql.Timestamp

/** Declarative field spec, mirroring the reference's `Field` dataclass
  * (reference: idrt/data.py:55-66). A field is a named group of subfields
  * normalized to a single fixed-width text column.
  */
final case class FieldSpec(field: String, subfields: Seq[String], maxLength: Int)

object FieldSpec {
  /** Default contact schema (reference: idrt/data.py:69-83). */
  val name  = FieldSpec("name", Seq("first_name", "last_name"), 50)
  val email = FieldSpec("email", Seq("email"), 35)
  val phone = FieldSpec("phone", Seq("phone"), 10)
  val state = FieldSpec("state", Seq("state"), 2)
  val zip   = FieldSpec("zip", Seq("zip"), 5)
  val all: Seq[FieldSpec] = Seq(name, email, phone, state, zip)
}

/** Common-Crawl-style web page row — the authoritative input shape
  * (BASELINE.json input_hint): url is the primary key, warc_ts drives
  * incremental recompute (plays the reference's contact_timestamp,
  * idrt/algorithm/prepare_data.py:70-77), lang plays `pool`
  * (idrt/algorithm/run_search.py:60-70).
  */
final case class WebPage(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Candidate pair emitted by blocking (reference: candidates table,
  * idrt/algorithm/run_search.py:207-236; class uuid + class_index are
  * replaced by carrying both keys on one row).
  */
final case class CandidatePair(url1: String, url2: String, blockKey: String, dist: Double)

/** Scored pair (reference: duplicates table, idrt/algorithm/run_search.py:515-536). */
final case class ScoredPair(
    url1: String,
    url2: String,
    lang1: String,
    lang2: String,
    score: Double,
    matches: Boolean,
    comparison_ts: Timestamp,
    pipeline_version: String)

/** Final entity assignment — new vs the reference (north rule adds
  * transitive clustering; the reference stops at the pair table,
  * idrt/algorithm/run_search.py:524-536).
  */
final case class ClusterAssignment(url: String, cluster_id: String)
