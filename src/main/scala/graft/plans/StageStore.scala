package graft.plans

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpointed stage tables with per-partition lineage + metrics —
  * the resume layer the north rule requires. The reference's analogue is
  * the six SQL stage tables + uuid consistency guards
  * (idrt/algorithm/utils.py:73-86, run_search.py:239-270); here every
  * stage writes partitioned parquet plus a `manifest.json` recording the
  * pipeline version, the inputs' fingerprints, the stage parameters and
  * per-partition row counts/checksums. A re-run whose (version, inputs,
  * params) fingerprint matches the manifest skips the stage and reads the
  * parquet back — i.e. kill-at-stage-k resumes at k+1.
  *
  * This sandbox has no Iceberg runtime (SURVEY.md par.7.4); the manifest
  * emulates the snapshot metadata an Iceberg table would carry, behind
  * this one object so a real catalog can be slotted in.
  */
object StageStore {

  final case class PartitionStat(partition: Int, rows: Long, checksum: Long)

  final case class Manifest(
      stage: String,
      pipelineVersion: String,
      inputsFingerprint: String,
      params: Map[String, String],
      rows: Long,
      partitions: Seq[PartitionStat],
      wallClockSec: Double,
      writtenAtMs: Long,
      /** true when partition stats are keyed by part-FILE index (the
        * current format); manifests written before that change keyed by
        * read-partition id and verify through the keying-independent
        * global aggregate instead — no spurious corruption refusal.
        */
      fileKeyedStats: Boolean = true)

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def toJson(m: Manifest): String = {
    val params = m.params.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val parts = m.partitions.sortBy(_.partition)
      .map(p => s"""{"partition":${p.partition},"rows":${p.rows},"checksum":${p.checksum}}""")
      .mkString("[", ",", "]")
    s"""{"stage":"${esc(m.stage)}","pipeline_version":"${esc(m.pipelineVersion)}",""" +
      s""""inputs_fingerprint":"${esc(m.inputsFingerprint)}","params":$params,""" +
      (if (m.fileKeyedStats) """"stat_keying":"file",""" else "") +
      s""""rows":${m.rows},"partitions":$parts,"wall_clock_sec":${m.wallClockSec},""" +
      s""""written_at_ms":${m.writtenAtMs}}"""
  }

  /** Stable fingerprint of a DataFrame's content: order-insensitive sum of
    * per-row 64-bit hashes over all columns. Used to fingerprint stage
    * inputs for resume decisions. One extra pass over the input — callers
    * fingerprint cheap identifiers (e.g. url + warc_ts), not whole rows.
    */
  def fingerprint(df: DataFrame): String = {
    val row = df
      .select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(bit_xor(col("h")).as("s"), count(lit(1)).as("n"))
      .head()
    val s = if (row.isNullAt(0)) 0L else row.getLong(0)
    s"${java.lang.Long.toHexString(s)}-${row.getLong(1)}"
  }

  private def manifestPath(root: String, stage: String) =
    Paths.get(root, stage, "manifest.json")

  private def dataPath(root: String, stage: String) =
    s"$root/$stage/data.parquet"

  def readManifest(root: String, stage: String): Option[Manifest] = {
    val p = manifestPath(root, stage)
    if (!Files.exists(p)) return None
    val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    // minimal field extraction (manifests are engine-written, schema-fixed)
    def field(name: String): Option[String] = {
      val m = ("\"" + name + "\":\"([^\"]*)\"").r.findFirstMatchIn(s)
      m.map(_.group(1))
    }
    // top-level "rows" precedes the partitions array in toJson's layout,
    // so the FIRST match is the stage row count, and every "checksum"
    // match is a per-partition xor — their xor is the global row-hash xor
    val totalRows = "\"rows\":(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong)
    val partStats = {
      val ps = "\\{\"partition\":(\\d+),\"rows\":(\\d+),\"checksum\":(-?\\d+)\\}".r
      ps.findAllMatchIn(s)
        .map(m => PartitionStat(m.group(1).toInt, m.group(2).toLong, m.group(3).toLong))
        .toSeq
    }
    for {
      st <- field("stage")
      v <- field("pipeline_version")
      f <- field("inputs_fingerprint")
    } yield Manifest(st, v, f, Map.empty, totalRows.getOrElse(0L), partStats, 0.0,
      "\"written_at_ms\":(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(0L),
      fileKeyedStats = s.contains("\"stat_keying\":\"file\""))
  }

  private val PartIdx = "part-(\\d+)".r

  /** Per-file (row count, xor of row hashes) aggregate over a stage's
    * parquet, keyed by the part index in the FILE NAME segment (the
    * directory path may itself contain "part-<digits>") — one pass, same
    * cost as the global aggregate, but localizable. Grouping by
    * input_file_name (not spark_partition_id) keeps the key stable even
    * when a large part file splits into several read partitions.
    */
  private def fileStats(df: DataFrame): Array[(Int, String, Long, Long)] =
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(df.columns.map(col): _*)), lit(0L)).as("x"))
      .collect()
      .map { r =>
        val file = r.getString(0)
        val name = file.substring(file.lastIndexOf('/') + 1)
        val idx = PartIdx.findFirstMatchIn(name).map(_.group(1).toInt).getOrElse(-1)
        (idx, file, r.getLong(1), r.getLong(2))
      }

  /** Read-side lineage check (north rule: per-partition lineage must be
    * USED, not just recorded): before a stage is resumed from its parquet,
    * recompute the per-file (row count, xor of row hashes) aggregates and
    * compare each against the manifest's recorded partition stats — a
    * corrupted, truncated, or partially-deleted stage refuses to resume
    * instead of silently feeding bad rows downstream, and the refusal
    * NAMES the offending file(s) so the operator can act on it. One
    * column-complete pass over the stage data; no recompute of the stage.
    */
  private def verifyLineage(df: DataFrame, m: Manifest, root: String, stage: String): Unit = {
    if (m.partitions.isEmpty) return // legacy manifest without stats
    if (!m.fileKeyedStats) {
      // pre-file-keying manifest (stats keyed by read-partition id): the
      // per-stat keys don't align with part files, but the XOR of all
      // checksums and the total row count are keying-independent — verify
      // globally instead of refusing intact data as corrupted
      val expectXor = m.partitions.map(_.checksum).foldLeft(0L)(_ ^ _)
      val r = df
        .agg(count(lit(1)).as("n"),
          coalesce(bit_xor(xxhash64(df.columns.map(col): _*)), lit(0L)).as("x"))
        .head()
      if (r.getLong(0) != m.rows || r.getLong(1) != expectXor)
        throw new IllegalStateException(
          s"stage '$stage' parquet at $root/$stage does not match its manifest lineage " +
            s"(rows ${r.getLong(0)} vs ${m.rows}, checksum ${r.getLong(1)} vs $expectXor) " +
            "— the stage data is corrupted or truncated; clear the stage directory to rebuild")
      return
    }
    val perFile = fileStats(df)
    val expect = m.partitions.map(p => p.partition -> p).toMap
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    perFile.foreach { case (idx, file, n, x) =>
      expect.get(idx) match {
        case None =>
          problems += s"file $file is not in the manifest (partition $idx)"
        case Some(p) if p.rows != n || p.checksum != x =>
          problems += s"file $file diverges from manifest partition $idx " +
            s"(rows $n vs ${p.rows}, checksum $x vs ${p.checksum})"
        case _ => ()
      }
    }
    val seen = perFile.map(_._1).toSet
    expect.keysIterator.filterNot(seen).toSeq.sorted.foreach { idx =>
      problems += s"manifest partition $idx (rows ${expect(idx).rows}) has no file on disk"
    }
    if (problems.nonEmpty)
      throw new IllegalStateException(
        s"stage '$stage' parquet at $root/$stage does not match its manifest lineage: " +
          problems.mkString("; ") +
          " — the stage data is corrupted or truncated; clear the stage directory to rebuild")
  }

  /** A skipped stage must also match its parameters; params are folded
    * into the stored fingerprint string.
    */
  private def fullFingerprint(inputsFp: String, params: Map[String, String]): String =
    inputsFp + "|" + params.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")

  /** Run (or resume) one stage. `compute` is only invoked when the stored
    * manifest does not match (version, inputs, params).
    */
  def runStage(
      spark: SparkSession,
      root: String,
      stage: String,
      pipelineVersion: String,
      inputsFingerprint: String,
      params: Map[String, String] = Map.empty)(compute: => DataFrame): DataFrame = {
    val fp = fullFingerprint(inputsFingerprint, params)
    readManifest(root, stage) match {
      case Some(m) if m.pipelineVersion == pipelineVersion && m.inputsFingerprint == fp =>
        val df = spark.read.parquet(dataPath(root, stage))
        verifyLineage(df, m, root, stage)
        df
      case Some(m) if m.pipelineVersion != pipelineVersion =>
        // model-consistency guard analogue (G2): refuse silent lineage mixing
        throw new IllegalStateException(
          s"stage '$stage' was written by pipeline version '${m.pipelineVersion}', " +
            s"current is '$pipelineVersion'; clear $root/$stage to rebuild")
      case _ =>
        val t0 = System.nanoTime()
        val out = compute
        out.write.mode("overwrite").parquet(dataPath(root, stage))
        val written = spark.read.parquet(dataPath(root, stage))
        // keyed by part-file index (see fileStats) so the read-side verify
        // can localize a mismatch to a named file; empty partitions write
        // rowless part files and are correctly absent on both sides
        val rawStats = fileStats(written)
        // write-time guard: an unparsable or duplicate part index would
        // collapse keys in the read-side expect map and make every later
        // resume of INTACT data refuse as "corrupted" — fail loudly now,
        // at write time, naming the files, instead
        rawStats.filter(_._1 < 0).foreach { case (_, file, _, _) =>
          throw new IllegalStateException(
            s"stage '$stage' wrote part file '$file' whose name has no parsable " +
              "part-<index> segment; manifest lineage would be ambiguous")
        }
        rawStats.groupBy(_._1).filter(_._2.length > 1).foreach { case (idx, fs) =>
          throw new IllegalStateException(
            s"stage '$stage' wrote multiple part files with index $idx: " +
              fs.map(_._2).mkString(", ") + "; manifest lineage would be ambiguous")
        }
        val stats = rawStats
          .map { case (idx, _, n, x) => PartitionStat(idx, n, x) }
          .toSeq.sortBy(_.partition)
        val manifest = Manifest(
          stage, pipelineVersion, fp, params,
          stats.map(_.rows).sum, stats,
          (System.nanoTime() - t0) / 1e9, System.currentTimeMillis())
        val tmp = Paths.get(root, stage, "manifest.json.tmp")
        Files.createDirectories(tmp.getParent)
        Files.write(tmp, toJson(manifest).getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, manifestPath(root, stage), StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        spark.read.parquet(dataPath(root, stage))
    }
  }
}
