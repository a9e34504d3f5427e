package graft.queries

import graft.sync.FileStore
import org.apache.spark.sql.functions._

/** Source-format coverage: the same table round-tripped through the
  * CSV / JSON faces of [[graft.sync.FileStore]] and then queried — verifying
  * the non-parquet readers/writers preserve values exactly (the oracle runs
  * against the ORIGINAL parquet, so any fidelity loss in the text formats
  * hash-mismatches).
  *
  * The staging dir is a harness-local tempdir (one write per Verify/Bench
  * process, like the sync fixtures); the store itself is path-agnostic — on
  * a cluster you'd point it at shared storage.
  */
object SourceQueries {
  import Registry.{table => T}

  private val staged = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Stage all format fixtures outside any timed query (Bench warmup). */
  def prestage(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    store(s, dir, "csv"); store(s, dir, "json"); store(s, dir, "orc"); ()
  }

  private def store(s: org.apache.spark.sql.SparkSession, dir: String,
                    format: String): FileStore = {
    val root = staged.getOrElseUpdate(s"$dir/$format", {
      val out = java.nio.file.Files.createTempDirectory(s"graft_src_$format").toString
      val st = new FileStore(s, out, format)
      format match {
        case "csv" =>
          // Narrow projection: numeric + single-token string columns (CSV has
          // no schema; inference must reconstruct long/string/double exactly).
          st.overwrite("orders", T(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")))
        case "orc" =>
          // ORC is binary-columnar like parquet: round-trip the widest type
          // mix (long, double, string, date) and aggregate — any encode/
          // decode drift hash-mismatches against the parquet-backed oracle.
          st.overwrite("lineitem", T(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
              col("l_returnflag"), col("l_shipdate")))
        case _ =>
          // JSON carries quoting/escaping: round-trip the free-text corpus.
          st.overwrite("documents", T(s, dir, "documents")
            .select(col("doc_id"), col("lang"), col("text")))
      }
      out
    })
    new FileStore(s, root, format)
  }

  def all: Seq[Q] = Seq(

    // ---- CSV source: write orders as CSV, read back with schema inference,
    //      aggregate. count/min/max are roundtrip-exact (shortest-repr double
    //      printing); the long sum pins the key column's integer fidelity.
    Q("src_csv_roundtrip",
      (s, dir) => store(s, dir, "csv").read("orders")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"),
          sum(col("o_orderkey").cast("decimal(20,0)")).cast("long").as("sum_key")),
      Some("""SELECT o_orderstatus, count(*) AS n_orders,
              | min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
              | cast(sum(o_orderkey) as bigint) AS sum_key
              |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // ---- JSON source: write documents as JSON lines, read back, fingerprint
    //      the text per row — any escaping/unicode infidelity flips the md5.
    Q("src_json_roundtrip",
      (s, dir) => store(s, dir, "json").read("documents")
        .select(col("doc_id"), col("lang"),
          md5(col("text")).as("text_md5"), length(col("text")).as("text_len")),
      Some("""SELECT doc_id, lang, md5(text) AS text_md5, length(text) AS text_len
              |FROM documents""".stripMargin)),

    // ---- ORC source: write lineitem as ORC, read back, aggregate — the
    //      third columnar face of FileStore (long/double/string/date all
    //      round-trip bit-exactly or the hash flips).
    Q("src_orc_roundtrip",
      (s, dir) => store(s, dir, "orc").read("lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).as("sum_qty"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"),
          sum(col("l_orderkey").cast("decimal(20,0)")).cast("long").as("sum_key")),
      Some("""SELECT l_returnflag, count(*) AS n_rows, sum(l_quantity) AS sum_qty,
              | min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
              | cast(sum(l_orderkey) as bigint) AS sum_key
              |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- binaryFile source: the raw-media ingest shape (one opaque file →
    //      one row of path metadata + `content` bytes — how image/audio
    //      corpora actually arrive before they become parquet binary
    //      columns, §Multimodal). Fixture: each document's text staged as a
    //      UTF-8 .bin file, written DRIVER-side (a bounded 256-row collect:
    //      fixture staging into a driver-local temp dir must not pretend to
    //      distribute — executor-side writes would land on other machines
    //      on a real cluster). The OPERATOR under test is the distributed
    //      read: Spark's built-in `binaryFile` format; length +
    //      md5(content) pin byte fidelity end-to-end, and the id
    //      round-trips through the filename. Capped at 256 files:
    //      file-per-row is the INPUT shape, not something to scale a
    //      fixture over (at 100 TB the first job compacts such drops into
    //      parquet binary columns — media_ingest_meta picks up from there).
    Q("src_binaryfile_ingest",
      (s, dir) => {
        val stage = java.nio.file.Files.createTempDirectory("graft_binfiles").toString
        T(s, dir, "documents").select(col("doc_id"), col("text"))
          .filter(col("doc_id") < 256)
          .collect().foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(stage, s"doc_${r.getLong(0)}.bin"),
              r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)); ()
          }
        s.read.format("binaryFile").load(s"$stage/*.bin")
          .select(
            regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1).cast("long").as("doc_id"),
            col("length"), md5(col("content")).as("content_md5"))
      },
      Some("""SELECT doc_id, cast(strlen(text) as bigint) AS length,
              | md5(text) AS content_md5
              |FROM documents WHERE doc_id < 256""".stripMargin)),

    // ---- Table-layout maintenance (ops.Layout): recurring ingest leaves
    //      small-file debt (driver-side listing/split-planning is the 100 TB
    //      bottleneck, not executor I/O). Both jobs are pure re-layouts with
    //      an atomic two-rename swap; the oracle gate is CONTENT INVARIANCE —
    //      the rewritten store's multiset fingerprint must equal the
    //      original table's, computed by DuckDB from the source parquet.
    //      File-count / healing / crash claims are spec'd in LayoutSpec.
    Q("layout_compact_small_files",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val stage = java.nio.file.Files.createTempDirectory("graft_layout_c").toString + "/documents"
        // Fragmented copy: 32 writer tasks → 32 small files, the shape a
        // recurring append loop accumulates.
        T(s, dir, "documents").repartition(32).write.mode("overwrite").parquet(stage)
        graft.ops.Layout.compactTable(s, stage, targetBytes = 64L << 20)
        graft.functions.Hashing.multisetFingerprintAgg(s.read.parquet(stage), docCols)
      },
      Some(Registry.duckMultisetFingerprint(
        Seq("doc_id", "text", "lang", "source", "n_chars"), "documents"))),

    // ---- Range-clustered rewrite: each output file owns a contiguous,
    //      pairwise-disjoint doc_id range (parquet min/max stats become
    //      disjoint across files → point/range predicates prune to the
    //      overlapping files only — data skipping ∝ selectivity). The
    //      disjointness post-condition rides the result as a boolean next
    //      to the same fingerprint-invariance gate.
    Q("layout_cluster_range",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val stage = java.nio.file.Files.createTempDirectory("graft_layout_z").toString + "/documents"
        T(s, dir, "documents").repartition(16).write.mode("overwrite").parquet(stage)
        graft.ops.Layout.clusterByRange(s, stage, "doc_id", nFiles = 8)
        val spans = graft.ops.Layout.fileSpans(s, stage, "doc_id")
        val disjoint = spans.nonEmpty && spans.sliding(2).forall(p =>
          p.length < 2 || p(1)._1 > p(0)._2)
        graft.functions.Hashing.multisetFingerprintAgg(s.read.parquet(stage), docCols)
          .withColumn("clustered_ok", lit(disjoint))
      },
      Some(s"""SELECT *, true AS clustered_ok FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"), "documents")})""".stripMargin)),

    // ---- Z-ORDER rewrite: files cluster compact REGIONS of the
    //      (doc_id, n_chars) plane via a Morton bit-interleave of the two
    //      min-max-normalized keys (pure codegen'd integer expressions, no
    //      UDF) — per-file spans shrink on BOTH dimensions at once, where a
    //      1-D sort collapses one and leaves the other spanning everything.
    //      Gate: fingerprint invariance (the z key is transient — dropped
    //      before the write) + mean normalized per-file span ≤ 0.6 on EACH
    //      dimension (ideal 16-file layout ≈ 0.25; an unclustered or 1-D
    //      layout reads ≈ 1.0 on the non-sorted dimension).
    Q("layout_cluster_zorder",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val stage = java.nio.file.Files.createTempDirectory("graft_layout_zo").toString + "/documents"
        T(s, dir, "documents").repartition(16).write.mode("overwrite").parquet(stage)
        graft.ops.Layout.clusterByZOrder(s, stage, "doc_id", "n_chars", nFiles = 16)
        val spanA = graft.ops.Layout.meanNormalizedSpan(s, stage, "doc_id")
        val spanB = graft.ops.Layout.meanNormalizedSpan(s, stage, "n_chars")
        graft.functions.Hashing.multisetFingerprintAgg(s.read.parquet(stage), docCols)
          .withColumn("zorder_ok", lit(spanA <= 0.6 && spanB <= 0.6))
      },
      Some(s"""SELECT *, true AS zorder_ok FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"), "documents")})""".stripMargin)),

    // ---- n-dimensional Z-ORDER: the Morton interleave generalizes past two
    //      keys (bit i of key j at position i·n + j, min(16, 62/n) bits per
    //      key) — here lineitem clustered on (l_orderkey, l_partkey,
    //      l_suppkey), so a conjunctive predicate on ANY subset of the three
    //      keys skips row groups / manifest files. Gate: fingerprint
    //      invariance + per-DIMENSION mean normalized span ≤ 0.75 on all
    //      three axes (ideal at 27 files ≈ 27^(-1/3) = 0.33; an unclustered
    //      layout reads ≈ 1.0 per axis, a 1-D sort ≈ 1.0 on two of three).
    Q("layout_cluster_zorder_n",
      (s, dir) => {
        val liCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_returnflag")
        val stage = java.nio.file.Files.createTempDirectory("graft_layout_zn").toString + "/lineitem"
        T(s, dir, "lineitem").select(liCols.map(col): _*)
          .repartition(16).write.mode("overwrite").parquet(stage)
        graft.ops.Layout.clusterByZOrderN(s, stage,
          Seq("l_orderkey", "l_partkey", "l_suppkey"), nFiles = 27)
        val spans = Seq("l_orderkey", "l_partkey", "l_suppkey")
          .map(c => graft.ops.Layout.meanNormalizedSpan(s, stage, c))
        graft.functions.Hashing.multisetFingerprintAgg(s.read.parquet(stage), liCols)
          .withColumn("zorder3_ok", lit(spans.forall(_ <= 0.75)))
      },
      Some(s"""SELECT *, true AS zorder3_ok FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_returnflag"),
                   "(SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_returnflag FROM lineitem) t")})""".stripMargin)),

    // ---- manifest-pruned range scan (ops.Manifest): the step that turns
    //      the clustered layout's disjoint per-file spans into actual
    //      FILE-level skipping (vanilla Spark plans every file; a manifest
    //      snapshot of per-file key ranges lets the scan read only the
    //      overlapping files — the Delta/Iceberg data-skipping mechanism on
    //      the same Hadoop-FS + atomic-rename primitives). Gate: the pruned
    //      scan's fingerprint ≡ DuckDB's fingerprint of the predicate's
    //      rows computed directly on the source table, plus the
    //      files-actually-pruned boolean.
    Q("manifest_pruned_scan",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val stage = java.nio.file.Files.createTempDirectory("graft_manifest").toString + "/documents"
        T(s, dir, "documents").repartition(8).write.mode("overwrite").parquet(stage)
        graft.ops.Layout.clusterByRange(s, stage, "doc_id", nFiles = 8)
        graft.ops.Manifest.create(s, stage, "doc_id")
        val (rows, nRead, nTotal) =
          graft.ops.Manifest.scanRange(s, stage, "doc_id", 100L, 199L)
        graft.functions.Hashing.multisetFingerprintAgg(rows, docCols)
          .withColumn("files_pruned", lit(nRead < nTotal))
      },
      Some(s"""SELECT *, true AS files_pruned FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"),
                   "(SELECT * FROM documents WHERE doc_id BETWEEN 100 AND 199) t")})""".stripMargin)),

    // ---- STATS EVOLUTION (round-17): CALL graft.system.restat adds
    //      min/max/count stats for a column that was NOT a create-time
    //      key — one narrow scan + one metadata commit — after which range
    //      predicates on it prune FILES, keyed mutations may target on it,
    //      and incremental refreshes carry it forward (superset-key
    //      contract). Gate: the post-restat pruned scan's fingerprint ≡
    //      DuckDB's replay (incl. a post-restat keyed merge on the NEW
    //      column), files actually pruned, and an appended file's stats
    //      carrying the restat column through createIncremental.
    Q("manifest_restat_pruned_scan",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val stage = java.nio.file.Files.createTempDirectory("graft_restat").toString + "/documents"
        // `n_chars` is uncorrelated with doc_id — cluster on a derived
        // monotone column is cheating; instead cluster the TABLE on
        // n_chars ranges so its per-file spans are disjoint, while the
        // manifest is CREATED keyed on doc_id only (n_chars stats absent).
        T(s, dir, "documents").repartitionByRange(8, col("n_chars"))
          .write.mode("overwrite").parquet(stage)
        graft.ops.Manifest.create(s, stage, "doc_id")
        // Pre-restat: a range scan on n_chars fails fast (no stats).
        val preRefused =
          try { graft.ops.Manifest.scanRange(s, stage, "n_chars", 0L, 10L); false }
          catch { case _: Exception => true }
        s.sql(s"CALL graft.system.restat('$stage', 'n_chars')")
        // Post-restat: files prune on the new column. Bounds from exact
        // integer arithmetic so DuckDB replays them identically.
        val mm = T(s, dir, "documents")
          .agg(min(col("n_chars")), max(col("n_chars"))).head()
        val (mn, mx) = (mm.getLong(0), mm.getLong(1))
        val (mid, hi) = (mn + (mx - mn) * 2 / 5, mn + (mx - mn) * 3 / 5)
        val (rows, nRead, nTotal) =
          graft.ops.Manifest.scanRange(s, stage, "n_chars", mid, hi)
        val pruned = nRead < nTotal
        // The refresh CARRIES the restat column: append a probe row whose
        // n_chars sits outside every existing span, via the incremental
        // snapshot path.
        graft.ops.Layout.append(s, stage,
          s.createDataFrame(java.util.List.of(
            org.apache.spark.sql.Row(9900001L, "restat probe", "en", "probe",
              mx + 1000L)),
            s.read.parquet(stage).schema)): Unit
        val keysAfter = graft.ops.Manifest.currentKeyCols(s, stage)
          .exists(k => k.contains("n_chars") && k.contains("doc_id"))
        // Keyed mutation TARGETING on the restat column: a mergeKeyed on
        // n_chars... n_chars is non-unique; use deleteRangeDV instead (the
        // stats-targeted mutation shape) on the probe row's unique range.
        val del = graft.ops.Layout.deleteRangeDV(s, stage, "n_chars",
          mx + 1000L, mx + 1000L)
        val probeGone = del.rowsDeleted == 1L &&
          graft.ops.Manifest.currentDv(s, stage).isDefined
        graft.functions.Hashing.multisetFingerprintAgg(rows, docCols)
          .withColumn("pre_refused", lit(preRefused))
          .withColumn("files_pruned", lit(pruned))
          .withColumn("keys_carried", lit(keysAfter))
          .withColumn("probe_gone", lit(probeGone))
      },
      Some(s"""WITH b AS (SELECT min(n_chars) + (max(n_chars) - min(n_chars)) * 2 // 5 AS mid,
               |                  min(n_chars) + (max(n_chars) - min(n_chars)) * 3 // 5 AS hi
               |           FROM documents)
               |SELECT *, true AS pre_refused, true AS files_pruned,
               | true AS keys_carried, true AS probe_gone FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"),
                   "(SELECT d.* FROM documents d, b WHERE d.n_chars BETWEEN b.mid AND b.hi) t")})""".stripMargin)),

    // ---- STRING stats keys (round-18): the manifest is created keyed on
    //      a STRING column — per-file binary-UTF-8 min/max (the order
    //      Spark's min/max aggregates produce). scanRangeString prunes
    //      files on the Scala path; the SQL read prunes a string equality
    //      at PLAN time (GraftStatsSkip string bounds). Gate: the string
    //      range scan's fingerprint ≡ DuckDB's replay (ASCII lang tags —
    //      binary order ≡ collation order), files actually pruned, and the
    //      SQL equality count exact through the catalog.
    Q("manifest_string_scan",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val stage = java.nio.file.Files.createTempDirectory("graft_strscan").toString + "/documents"
        T(s, dir, "documents")
          .repartitionByRange(8, col("lang"), col("doc_id"))
          .write.mode("overwrite").parquet(stage)
        graft.ops.Manifest.create(s, stage, "doc_id", "lang")
        val (rows, nRead, nTotal) =
          graft.ops.Manifest.scanRangeString(s, stage, "lang", "de", "en")
        val zh = s.sql(
          s"SELECT count(*) AS c FROM graft.`$stage` WHERE lang = 'zh'")
          .head().getLong(0)
        graft.functions.Hashing.multisetFingerprintAgg(rows, docCols)
          .withColumn("files_pruned", lit(nRead < nTotal))
          .withColumn("zh_rows", lit(zh))
      },
      Some(s"""SELECT *, true AS files_pruned,
               | (SELECT count(*) FROM documents WHERE lang = 'zh')::BIGINT
               |   AS zh_rows FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"),
                   "(SELECT * FROM documents WHERE lang >= 'de' AND lang <= 'en') t")})""".stripMargin)),

    // ---- the full composition: Z-ORDER layout + multi-column manifest +
    //      BOX predicate. Single-column stats only serve 1-D ranges; with
    //      per-file min/max on BOTH keys, a conjunctive range predicate
    //      prunes to the files whose (doc_id, n_chars) rectangle overlaps
    //      the query box — the skipping shape Z-order exists to enable.
    Q("manifest_zorder_box_scan",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val stage = java.nio.file.Files.createTempDirectory("graft_manifest_z").toString + "/documents"
        T(s, dir, "documents").repartition(16).write.mode("overwrite").parquet(stage)
        graft.ops.Layout.clusterByZOrder(s, stage, "doc_id", "n_chars", nFiles = 16)
        graft.ops.Manifest.create(s, stage, "doc_id", "n_chars")
        val (rows, nRead, nTotal) = graft.ops.Manifest.scanBox(s, stage,
          Seq(("doc_id", 100L, 299L), ("n_chars", 200L, 400L)))
        graft.functions.Hashing.multisetFingerprintAgg(rows, docCols)
          .withColumn("files_pruned", lit(nRead < nTotal))
      },
      Some(s"""SELECT *, true AS files_pruned FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"),
                   "(SELECT * FROM documents WHERE doc_id BETWEEN 100 AND 299 AND n_chars BETWEEN 200 AND 400) t")})""".stripMargin)),

    // ---- hive-partitioned rewrite + planning-time pruning: the layout for
    //      CATEGORICAL predicates. After Layout.partitionByColumn("lang"),
    //      a lang-equality scan prunes whole directories at PLANNING time —
    //      the scan's executed numFiles metric counts ONLY the matching
    //      partition's files (row-group stats, by contrast, still plan and
    //      footer-read every file). Gate: fingerprint of the pruned scan ≡
    //      DuckDB on the predicate's rows, plus the measured
    //      fewer-files-planned boolean.
    Q("layout_partition_rewrite",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val stage = java.nio.file.Files.createTempDirectory("graft_layout_p").toString + "/documents"
        T(s, dir, "documents").repartition(8).write.mode("overwrite").parquet(stage)
        graft.ops.Layout.partitionByColumn(s, stage, "lang")
        val fs = new org.apache.hadoop.fs.Path(stage)
          .getFileSystem(s.sessionState.newHadoopConf())
        val totalFiles = graft.ops.FsMaint.dataFileCount(fs,
          new org.apache.hadoop.fs.Path(stage))
        val probe = s.read.parquet(stage).filter(col("lang") === "en")
        probe.collect(): Unit
        import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
        import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
        def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
          case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
          case f: FileSourceScanExec => Seq(f)
          case other => other.children.flatMap(scans)
        }
        val planned = scans(probe.queryExecution.executedPlan)
          .map(_.metrics("numFiles").value).sum
        graft.functions.Hashing.multisetFingerprintAgg(probe, docCols)
          .withColumn("partition_pruned", lit(planned > 0 && planned < totalFiles))
      },
      Some(s"""SELECT *, true AS partition_pruned FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"),
                   "(SELECT * FROM documents WHERE lang = 'en') t")})""".stripMargin)),

    // ---- copy-on-write DELETE WHERE (the Iceberg/Delta COW shape): on a
    //      range-clustered table the manifest stats target the delete to
    //      the overlapping files only — those are decoded and rewritten
    //      without the doomed rows, every other file is carried by a pure
    //      metadata rename, and a journaled file-level commit heals any
    //      crash (LayoutSpec exercises both crash windows). Gate: the
    //      surviving table's fingerprint ≡ DuckDB's NOT BETWEEN, the
    //      deleted-row count ≡ DuckDB's BETWEEN count, and the rewrite
    //      touched a strict subset of files.
    Q("layout_delete_range",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val stage = java.nio.file.Files.createTempDirectory("graft_layout_d").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.repartitionByRange(8, col("doc_id")).write.mode("overwrite").parquet(stage)
        graft.ops.Manifest.create(s, stage, "doc_id")
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        val res = graft.ops.Layout.deleteRange(s, stage, "doc_id", maxId / 4, maxId / 2)
        graft.functions.Hashing.multisetFingerprintAgg(s.read.parquet(stage), docCols)
          .withColumn("rows_deleted", lit(res.rowsDeleted))
          .withColumn("targeted",
            lit(res.filesRewritten > 0 && res.filesRewritten < res.filesTotal))
      },
      Some(s"""WITH b AS (SELECT max(doc_id) // 4 AS lo, max(doc_id) // 2 AS hi FROM documents)
               |SELECT *,
               | (SELECT count(*) FROM documents, b WHERE doc_id BETWEEN b.lo AND b.hi)::BIGINT AS rows_deleted,
               | true AS targeted FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"),
                   "(SELECT d.* FROM documents d, b WHERE d.doc_id NOT BETWEEN b.lo AND b.hi) t")})""".stripMargin)),

    // ---- MERGE-ON-READ delete (deletion vectors): the same range delete
    //      at ZERO data files rewritten — matching row positions land in a
    //      per-snapshot `_dv/` sidecar (one metadata-only commit) and every
    //      engine read applies the vector as an anti-join on (file name,
    //      parquet _metadata.row_index). The CDC write-amplification
    //      answer: frequent small deletes cost O(sidecar), compaction
    //      folds vectors back into data files. Gate: fingerprint ≡ DuckDB
    //      after TWO composed DV deletes, exact deleted counts, zero data
    //      files touched (mtime-stable), time travel exact across the DV
    //      snapshot, and the change feed carrying the DV-only delta.
    Q("layout_delete_dv",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val stage = java.nio.file.Files.createTempDirectory("graft_layout_dv").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.repartitionByRange(8, col("doc_id")).write.mode("overwrite").parquet(stage)
        val id1 = graft.ops.Manifest.create(s, stage, "doc_id")
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        val fs = new org.apache.hadoop.fs.Path(stage)
          .getFileSystem(s.sessionState.newHadoopConf())
        def stamps(): Map[String, Long] = {
          val out = Map.newBuilder[String, Long]
          graft.ops.FsMaint.walkFiles(fs, new org.apache.hadoop.fs.Path(stage)) { st =>
            val p = st.getPath.toUri.getPath
            if (st.getPath.getName.startsWith("part-") && !p.contains("_graft"))
              out += p -> st.getModificationTime
            true
          }
          out.result()
        }
        val before = stamps()
        val r1 = graft.ops.Layout.deleteRangeDV(s, stage, "doc_id", maxId / 4, maxId / 2)
        val id2 = graft.ops.Manifest.latestSnapshotId(s, stage).get
        val r2 = graft.ops.Layout.deleteRangeDV(s, stage, "doc_id", 0L, maxId / 8)
        val zeroTouched = stamps() == before &&
          r1.filesRewritten == 0 && r2.filesRewritten == 0
        val latest = graft.ops.Manifest.latestSnapshotId(s, stage).get
        // Time travel: the pre-delete snapshot reads everything; the CDF
        // across the first DV-only commit carries exactly its deletes.
        val asOf1Full = graft.ops.Manifest.readAsOf(s, stage, id1).count() == docs.count()
        val feed = graft.ops.Manifest.changesBetween(s, stage, id1, id2)
        val feedOk = feed.filter(col("change") === "insert").count() == 0L &&
          feed.filter(col("change") === "delete").count() == r1.rowsDeleted
        graft.functions.Hashing.multisetFingerprintAgg(
            graft.ops.Manifest.readAsOf(s, stage, latest), docCols)
          .withColumn("rows_deleted", lit(r1.rowsDeleted))
          .withColumn("rows_deleted2", lit(r2.rowsDeleted))
          .withColumn("zero_files_touched", lit(zeroTouched))
          .withColumn("asof_full", lit(asOf1Full))
          .withColumn("cdf_ok", lit(feedOk))
      },
      Some(s"""WITH b AS (SELECT max(doc_id) // 8 AS l8, max(doc_id) // 4 AS lo,
               |                  max(doc_id) // 2 AS hi FROM documents)
               |SELECT *,
               | (SELECT count(*) FROM documents, b WHERE doc_id BETWEEN b.lo AND b.hi)::BIGINT AS rows_deleted,
               | (SELECT count(*) FROM documents, b WHERE doc_id BETWEEN 0 AND b.l8)::BIGINT AS rows_deleted2,
               | true AS zero_files_touched, true AS asof_full, true AS cdf_ok FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"),
                   ("(SELECT d.* FROM documents d, b WHERE d.doc_id NOT BETWEEN b.lo AND b.hi " +
                    "AND d.doc_id NOT BETWEEN 0 AND b.l8) t"))})""".stripMargin)),

    // ---- SQL reads of a DV-BEARING snapshot (GraftDvReadRule): the
    //      catalog serves merge-on-read deletes WITHOUT compaction — the
    //      extension rule swaps the relation for a V1 scan over the same
    //      descriptor file index with the sidecar anti-join directly above
    //      it (full pushdown kept; contract-pinned in DeletionVectorSpec).
    //      Gate: SELECT * fingerprint ≡ DuckDB with the deletes applied,
    //      a pushed-filter SQL count exact, VERSION AS OF reading the
    //      pre-delete snapshot in full, $files still serving, and the DV
    //      commit rewriting zero data files.
    Q("sql_select_dv",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val stage = java.nio.file.Files.createTempDirectory("graft_sql_dv").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.repartitionByRange(8, col("doc_id")).write.mode("overwrite").parquet(stage)
        graft.ops.Manifest.create(s, stage, "doc_id")
        val id1 = graft.ops.Manifest.latestSnapshotId(s, stage).get
        val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
        val r = graft.ops.Layout.deleteRangeDV(s, stage, "doc_id", mx / 4, mx / 2)
        val zeroRewrites = r.filesRewritten == 0 && r.rowsDeleted > 0
        // Pushed-filter SQL read straddling the deleted range.
        val filtered = s.sql(s"SELECT count(*) AS c FROM graft.`$stage` " +
          s"WHERE doc_id BETWEEN ${mx / 8} AND ${3 * mx / 8}").head().getLong(0)
        val asOfFull = s.sql(
          s"SELECT count(*) AS c FROM graft.`$stage` VERSION AS OF $id1")
          .head().getLong(0) == docs.count()
        val filesMeta = s.sql(
          s"SELECT count(*) AS c FROM graft.`$stage$$files`")
          .head().getLong(0) > 0L
        graft.functions.Hashing.multisetFingerprintAgg(
            s.sql(s"SELECT * FROM graft.`$stage`"), docCols)
          .withColumn("n_filtered", lit(filtered))
          .withColumn("zero_rewrites", lit(zeroRewrites))
          .withColumn("asof_full", lit(asOfFull))
          .withColumn("files_meta", lit(filesMeta))
      },
      Some(s"""WITH b AS (SELECT max(doc_id) // 8 AS l8, max(doc_id) // 4 AS lo,
               |                  3 * max(doc_id) // 8 AS h38, max(doc_id) // 2 AS hi
               |           FROM documents)
               |SELECT *,
               | (SELECT count(*) FROM documents, b
               |   WHERE doc_id BETWEEN b.l8 AND b.h38
               |     AND doc_id NOT BETWEEN b.lo AND b.hi)::BIGINT AS n_filtered,
               | true AS zero_rewrites, true AS asof_full, true AS files_meta FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"),
                   "(SELECT d.* FROM documents d, b WHERE d.doc_id NOT BETWEEN b.lo AND b.hi) t")})""".stripMargin)),

    // ---- SQL DELETE in MERGE-ON-READ mode (`SET graft.delete.mode=dv`):
    //      the statement surface of Layout.deleteRangeDV — the reference's
    //      delete semantic (TableConnection.php:367-387) arriving as SQL at
    //      ZERO data files rewritten (mtime-asserted), readable immediately
    //      via GraftDvReadRule, CDF carrying the DV-only delta, and
    //      CALL graft.system.compact_deletes folding the vector back into
    //      data files with content unchanged.
    Q("sql_dml_dv",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val stage = java.nio.file.Files.createTempDirectory("graft_sql_dmldv").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.repartitionByRange(8, col("doc_id")).write.mode("overwrite").parquet(stage)
        graft.ops.Manifest.create(s, stage, "doc_id")
        val id1 = graft.ops.Manifest.latestSnapshotId(s, stage).get
        val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
        val fs = new org.apache.hadoop.fs.Path(stage)
          .getFileSystem(s.sessionState.newHadoopConf())
        def stamps(): Map[String, Long] = {
          val out = Map.newBuilder[String, Long]
          graft.ops.FsMaint.walkFiles(fs, new org.apache.hadoop.fs.Path(stage)) { st =>
            val p = st.getPath.toUri.getPath
            if (st.getPath.getName.startsWith("part-") && !p.contains("_graft"))
              out += p -> st.getModificationTime
            true
          }
          out.result()
        }
        val before = stamps()
        s.sql("SET graft.delete.mode=dv")
        s.sql("SET graft.merge.mode=dv")
        try {
          s.sql(s"DELETE FROM graft.`$stage` " +
            s"WHERE doc_id BETWEEN ${mx / 4} AND ${mx / 2}")
          s.sql(s"DELETE FROM graft.`$stage` WHERE doc_id < ${mx / 8}")
          // Merge-on-read UPDATE: matched old versions become DV positions,
          // the updated rows APPEND — still zero files rewritten.
          s.sql(s"UPDATE graft.`$stage` SET source = 'dvupd' " +
            s"WHERE doc_id BETWEEN ${5 * mx / 8} AND ${3 * mx / 4}")
        } finally {
          s.sql("SET graft.delete.mode=cow")
          s.sql("SET graft.merge.mode=cow")
        }
        // Pre-existing files untouched (the UPDATE appended new ones).
        val zeroTouched = before.toSet.subsetOf(stamps().toSet)
        val id2 = graft.ops.Manifest.latestSnapshotId(s, stage).get
        val dvPresent = graft.ops.Manifest.hasDv(s, stage, id2)
        // CDF across the DV-only commits: deletes = two ranges + the
        // UPDATE's replaced old versions; inserts = the UPDATE's new rows.
        val feed = graft.ops.Manifest.changesBetween(s, stage, id1, id2)
        val nDel = feed.filter(col("change") === "delete").count()
        val nIns = feed.filter(col("change") === "insert").count()
        // Read-before-fold (the DV rule), then fold and re-read: identical.
        val fpBefore = graft.functions.Hashing.multisetFingerprintAgg(
          s.sql(s"SELECT * FROM graft.`$stage`"), docCols).head().getString(0)
        val folded = s.sql(s"CALL graft.system.compact_deletes('$stage')")
          .head().getLong(0) > 0L
        val noDvAfter = !graft.ops.Manifest.hasDv(s, stage,
          graft.ops.Manifest.latestSnapshotId(s, stage).get)
        graft.functions.Hashing.multisetFingerprintAgg(
            s.sql(s"SELECT * FROM graft.`$stage`"), docCols)
          .withColumn("same_before_fold", lit(fpBefore) === col("fingerprint"))
          .withColumn("rows_cdf_deleted", lit(nDel))
          .withColumn("rows_cdf_inserted", lit(nIns))
          .withColumn("zero_files_touched", lit(zeroTouched && dvPresent))
          .withColumn("folded", lit(folded && noDvAfter))
      },
      Some(s"""WITH b AS (SELECT max(doc_id) // 8 AS l8, max(doc_id) // 4 AS lo,
               |                  max(doc_id) // 2 AS hi, 5 * max(doc_id) // 8 AS u1,
               |                  3 * max(doc_id) // 4 AS u2 FROM documents),
               | upd AS (SELECT count(*) AS n FROM documents, b
               |          WHERE doc_id BETWEEN b.u1 AND b.u2)
               |SELECT *, true AS same_before_fold,
               | ((SELECT count(*) FROM documents, b
               |    WHERE doc_id BETWEEN b.lo AND b.hi OR doc_id < b.l8)
               |  + (SELECT n FROM upd))::BIGINT AS rows_cdf_deleted,
               | (SELECT n FROM upd)::BIGINT AS rows_cdf_inserted,
               | true AS zero_files_touched, true AS folded FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"),
                   ("(SELECT d.doc_id, d.text, d.lang, CASE WHEN d.doc_id BETWEEN b.u1 AND b.u2 " +
                    "THEN 'dvupd' ELSE d.source END AS source, d.n_chars " +
                    "FROM documents d, b WHERE d.doc_id NOT BETWEEN b.lo AND b.hi " +
                    "AND d.doc_id >= b.l8) t"))})""".stripMargin)),

    // ---- INSERT OVERWRITE / REPLACE WHERE: the standard pipeline-reload
    //      shapes, each ONE atomic COW commit (delete + insert together —
    //      never the deleted-but-not-reinserted middle a DELETE+INSERT pair
    //      exposes). A static-partition overwrite reloads lang='en' in place
    //      (every other partition's files carried untouched, mtime-asserted);
    //      a predicate overwrite (DataFrameWriterV2 `.overwrite(cond)`, the
    //      REPLACE WHERE shape) reloads a doc_id range (only overlapping
    //      files rewritten — strict-subset asserted). Gate: final
    //      fingerprint ≡ DuckDB's replay of both reloads.
    Q("sql_insert_overwrite",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val stage = java.nio.file.Files.createTempDirectory("graft_sql_ow").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.repartitionByRange(8, col("doc_id"))
          .write.partitionBy("lang").mode("overwrite").parquet(stage)
        graft.ops.Manifest.create(s, stage, "doc_id")
        val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
        val fs = new org.apache.hadoop.fs.Path(stage)
          .getFileSystem(s.sessionState.newHadoopConf())
        def stamps(): Map[String, Long] = {
          val out = Map.newBuilder[String, Long]
          graft.ops.FsMaint.walkFiles(fs, new org.apache.hadoop.fs.Path(stage)) { st =>
            val p = st.getPath.toUri.getPath
            if (st.getPath.getName.startsWith("part-") && !p.contains("_graft"))
              out += p -> st.getModificationTime
            true
          }
          out.result()
        }
        val before = stamps()
        docs.createOrReplaceTempView("sql_ow_docs")
        // 1. Static-partition overwrite: reload lang='en' (the partition
        //    value is injected by the analyzer; the SELECT carries the
        //    remaining columns in table order).
        s.sql(s"INSERT OVERWRITE graft.`$stage` PARTITION (lang='en') " +
          "SELECT doc_id, text, 'owp' AS source, n_chars + 1000 AS n_chars " +
          "FROM sql_ow_docs WHERE lang = 'en'")
        val after1 = stamps()
        val partUntouched = before.filterNot(_._1.contains("lang=en"))
          .toSet.subsetOf(after1.toSet)
        // 2. REPLACE WHERE: reload the top doc_id range across partitions.
        val lo = mx - 50
        docs.filter(col("doc_id").between(lo, mx))
          .select(col("doc_id"), col("text"), lit("owr").as("source"),
            lit(777L).as("n_chars"), col("lang"))
          .writeTo(s"graft.`$stage`")
          .overwrite(col("doc_id").between(lo, mx))
        val after2 = stamps()
        // Strict-subset rewrite: most files carried by metadata moves.
        val rangeSubset = (after1.toSet -- after2.toSet).size < after1.size / 2
        graft.functions.Hashing.multisetFingerprintAgg(
            s.sql(s"SELECT * FROM graft.`$stage`"), docCols)
          .withColumn("partition_untouched", lit(partUntouched))
          .withColumn("range_strict_subset", lit(rangeSubset))
      },
      Some(s"""WITH b AS (SELECT max(doc_id) - 50 AS lo, max(doc_id) AS hi
               |            FROM documents),
               | s1 AS (SELECT doc_id, text, lang, source, n_chars
               |          FROM documents WHERE lang <> 'en'
               |        UNION ALL
               |        SELECT doc_id, text, lang, 'owp' AS source,
               |               n_chars + 1000 AS n_chars
               |          FROM documents WHERE lang = 'en'),
               | s2 AS (SELECT doc_id, text, lang, source, n_chars FROM s1
               |         WHERE doc_id < (SELECT lo FROM b)
               |            OR doc_id > (SELECT hi FROM b)
               |        UNION ALL
               |        SELECT doc_id, text, lang, 'owr' AS source,
               |               777::BIGINT AS n_chars
               |          FROM documents
               |         WHERE doc_id BETWEEN (SELECT lo FROM b)
               |                          AND (SELECT hi FROM b))
               |SELECT *, true AS partition_untouched, true AS range_strict_subset
               |FROM (${Registry.duckMultisetFingerprint(
                  Seq("doc_id", "text", "lang", "source", "n_chars"), "s2")})""".stripMargin)),

    // ---- COMPOSITE-KEY MERGE INTO: ON is a conjunction of equalities over
    //      (doc_id, lang) — tuple row identity (the reference's PK is a
    //      composite column list, TableConnection.php:635-656), file
    //      targeting on the stats-covered component's [min, max]. A probe
    //      row sharing doc_id but not lang must NOT match (it inserts);
    //      matched tuples take conditional DELETE / partial UPDATE. Gate:
    //      final fingerprint ≡ DuckDB's replay of the clause semantics,
    //      exact per-action counts, strict-subset rewrite.
    Q("sql_merge_composite",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val stage = java.nio.file.Files.createTempDirectory("graft_sql_cmrg").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.repartitionByRange(8, col("doc_id")).write.mode("overwrite").parquet(stage)
        graft.ops.Manifest.create(s, stage, "doc_id")
        val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
        val (u8, q4) = (mx / 8, mx / 4)
        val srcCols = Seq(col("doc_id"), col("lang"), col("n_chars").as("nc"))
        // u: matched tuples → partial UPDATE; d: matched tuples → DELETE;
        // zz: doc_id in range but lang never matches → INSERT; n: new ids.
        val delta = docs.filter(col("doc_id") < u8)
          .select(srcCols :+ lit("u").as("mark"): _*)
          .unionByName(docs.filter(col("doc_id").between(q4, q4 + u8 - 1))
            .select(srcCols :+ lit("d").as("mark"): _*))
          .unionByName(docs.filter(col("doc_id").between(3 * mx / 8, 3 * mx / 8 + 19))
            .withColumn("lang", lit("zz"))
            .select(srcCols :+ lit("u").as("mark"): _*))
          .unionByName(docs.filter(col("doc_id") < 10)
            .withColumn("doc_id", col("doc_id") + mx + 1)
            .select(srcCols :+ lit("u").as("mark"): _*))
        delta.createOrReplaceTempView("sql_cmrg_delta")
        val total = graft.ops.Manifest.files(s, stage).count().toInt
        val m = s.sql(
          s"""MERGE INTO graft.`$stage` t USING sql_cmrg_delta s
             |ON t.doc_id = s.doc_id AND t.lang = s.lang
             |WHEN MATCHED AND s.mark = 'd' THEN DELETE
             |WHEN MATCHED THEN UPDATE SET n_chars = s.nc + 7, source = 'cupd'
             |WHEN NOT MATCHED THEN INSERT (doc_id, lang, source, n_chars)
             |  VALUES (s.doc_id, s.lang, 'cins', s.nc)""".stripMargin).head()
        graft.functions.Hashing.multisetFingerprintAgg(s.read.parquet(stage), docCols)
          .withColumn("rows_updated", lit(m.getLong(m.fieldIndex("rows_updated"))))
          .withColumn("rows_deleted", lit(m.getLong(m.fieldIndex("rows_deleted"))))
          .withColumn("rows_inserted", lit(m.getLong(m.fieldIndex("rows_inserted"))))
          .withColumn("targeted",
            lit(m.getInt(m.fieldIndex("files_rewritten")) > 0 &&
              m.getInt(m.fieldIndex("files_rewritten")) < total))
      },
      Some(s"""WITH b AS (SELECT max(doc_id) // 8 AS u8, max(doc_id) // 4 AS q4,
               |                  3 * max(doc_id) // 8 AS z1,
               |                  3 * max(doc_id) // 8 + 19 AS z2,
               |                  max(doc_id) AS mx FROM documents),
               | final AS (
               |  SELECT d.doc_id, d.text, d.lang,
               |    CASE WHEN d.doc_id < b.u8 THEN 'cupd' ELSE d.source END AS source,
               |    CASE WHEN d.doc_id < b.u8 THEN d.n_chars + 7 ELSE d.n_chars END AS n_chars
               |  FROM documents d, b
               |  WHERE d.doc_id NOT BETWEEN b.q4 AND b.q4 + b.u8 - 1
               |  UNION ALL
               |  SELECT doc_id, NULL, 'zz', 'cins', n_chars
               |   FROM documents, b WHERE doc_id BETWEEN b.z1 AND b.z2
               |  UNION ALL
               |  SELECT doc_id + b.mx + 1, NULL, lang, 'cins', n_chars
               |   FROM documents, b WHERE doc_id < 10)
               |SELECT *,
               | (SELECT count(*) FROM documents, b WHERE doc_id < b.u8)::BIGINT AS rows_updated,
               | (SELECT count(*) FROM documents, b
               |   WHERE doc_id BETWEEN b.q4 AND b.q4 + b.u8 - 1)::BIGINT AS rows_deleted,
               | (SELECT count(*) + 10 FROM documents, b
               |   WHERE doc_id BETWEEN b.z1 AND b.z2)::BIGINT AS rows_inserted,
               | true AS targeted FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"), "final t")})""".stripMargin)),

    // ---- BRANCH lifecycle (writable refs on the snapshot chain, the
    //      git-checkout posture): CALL create_branch forks at the current
    //      snapshot and moves the working head onto the branch; DML
    //      commits advance the branch while VERSION AS OF 'main' keeps
    //      reading the pinned fork; fast_forward merges metadata-only. A
    //      second lifecycle exercises abandon_branch (COW restore to the
    //      fork). Gate: main unchanged during the branch, branch head
    //      visible via its ref, post-ff trunk ≡ DuckDB's replay of the
    //      branch commits, and the abandoned edit leaving no trace.
    Q("sql_branch_lifecycle",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val stage = java.nio.file.Files.createTempDirectory("graft_sql_br").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.repartitionByRange(8, col("doc_id")).write.mode("overwrite").parquet(stage)
        graft.ops.Manifest.create(s, stage, "doc_id")
        val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
        val nAll = docs.count()
        s.sql(s"CALL graft.system.create_branch('$stage', 'dev')")
        // Branch commits: a DELETE and an INSERT.
        s.sql(s"DELETE FROM graft.`$stage` " +
          s"WHERE doc_id BETWEEN ${mx / 4} AND ${mx / 2}")
        docs.filter(col("doc_id") < 10)
          .withColumn("doc_id", col("doc_id") + mx + 1)
          .withColumn("source", lit("branched"))
          .createOrReplaceTempView("sql_br_ins")
        s.sql(s"INSERT INTO graft.`$stage` SELECT * FROM sql_br_ins")
        // main is UNCHANGED while the branch holds the edits.
        val mainPinned = s.sql(
          s"SELECT count(*) AS c FROM graft.`$stage` VERSION AS OF 'main'")
          .head().getLong(0) == nAll
        val branchHead = s.sql(
          s"SELECT count(*) AS c FROM graft.`$stage` VERSION AS OF 'dev'")
          .head().getLong(0)
        // Fast-forward: trunk takes the branch state, metadata-only.
        s.sql(s"CALL graft.system.fast_forward('$stage', 'dev')")
        val mainAfterFf = s.sql(
          s"SELECT count(*) AS c FROM graft.`$stage` VERSION AS OF 'main'")
          .head().getLong(0) == branchHead
        // Second lifecycle: an abandoned edit leaves no trace.
        s.sql(s"CALL graft.system.create_branch('$stage', 'scratch')")
        s.sql(s"DELETE FROM graft.`$stage` WHERE doc_id < ${mx / 8}")
        s.sql(s"CALL graft.system.abandon_branch('$stage', 'scratch')")
        graft.functions.Hashing.multisetFingerprintAgg(
            s.sql(s"SELECT * FROM graft.`$stage`"), docCols)
          .withColumn("main_pinned", lit(mainPinned))
          .withColumn("branch_rows", lit(branchHead))
          .withColumn("ff_metadata_only", lit(mainAfterFf))
      },
      Some(s"""WITH b AS (SELECT max(doc_id) // 4 AS lo, max(doc_id) // 2 AS hi,
               |                  max(doc_id) AS mx FROM documents),
               | final AS (
               |  SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
               |   FROM documents d, b WHERE d.doc_id NOT BETWEEN b.lo AND b.hi
               |  UNION ALL
               |  SELECT doc_id + b.mx + 1, text, lang, 'branched', n_chars
               |   FROM documents, b WHERE doc_id < 10)
               |SELECT *, true AS main_pinned,
               | (SELECT count(*) FROM final)::BIGINT AS branch_rows,
               | true AS ff_metadata_only FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"), "final t")})""".stripMargin)),

    // ---- MULTI-BRANCH refs (round-17): N branches on the one physical
    //      chain, one checked out at a time — checkout_branch pins the
    //      holder's head, COW-restores the working tree, and unpins the
    //      target, which is what makes branches truly DIVERGE on a linear
    //      snapshot chain. Gate: two branches fork from main and hold
    //      DIFFERENT edits, all three refs readable AT ONCE (main
    //      untouched throughout the divergence), fast-forward merges one
    //      branch into main, abandoning the dormant other leaves no trace,
    //      and the final trunk ≡ DuckDB's replay of the merged branch.
    Q("sql_branch_multi",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val stage = java.nio.file.Files.createTempDirectory("graft_sql_brm").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.repartitionByRange(8, col("doc_id")).write.mode("overwrite").parquet(stage)
        graft.ops.Manifest.create(s, stage, "doc_id")
        val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
        val nAll = docs.count()
        def refCount(name: String): Long = s.sql(
          s"SELECT count(*) AS c FROM graft.`$stage` VERSION AS OF '$name'")
          .head().getLong(0)
        // Branch A: fork at main, delete the low range.
        s.sql(s"CALL graft.system.create_branch('$stage', 'expA')")
        s.sql(s"DELETE FROM graft.`$stage` WHERE doc_id < ${mx / 8}")
        // Branch B: fork from MAIN — checkout is METADATA-ONLY (zero data
        // movement; the catalog's latest view serves main's pinned head),
        // and create_branch materializes the tree lazily before forking.
        s.sql(s"CALL graft.system.checkout_branch('$stage', 'main')")
        val mainRestored = s.sql(s"SELECT count(*) AS c FROM graft.`$stage`")
          .head().getLong(0) == nAll
        s.sql(s"CALL graft.system.create_branch('$stage', 'expB')")
        s.sql(s"DELETE FROM graft.`$stage` WHERE doc_id >= ${3 * mx / 4}")
        docs.filter(col("doc_id") < 8)
          .withColumn("doc_id", col("doc_id") + mx + 1)
          .withColumn("source", lit("expB"))
          .createOrReplaceTempView("sql_brm_ins")
        s.sql(s"INSERT INTO graft.`$stage` SELECT * FROM sql_brm_ins")
        // All three refs readable AT ONCE — true divergence; main untouched.
        val aRows = refCount("expA")
        val bRows = refCount("expB")
        val mainPinned = refCount("main") == nAll
        // Merge A into main (checkout + metadata-only ff); abandon dormant
        // B (ref drop only — its edits leave no trace on the trunk).
        s.sql(s"CALL graft.system.checkout_branch('$stage', 'expA')")
        s.sql(s"CALL graft.system.fast_forward('$stage', 'expA')")
        s.sql(s"CALL graft.system.abandon_branch('$stage', 'expB')")
        val mergedMain = refCount("main") == aRows
        graft.functions.Hashing.multisetFingerprintAgg(
            s.sql(s"SELECT * FROM graft.`$stage`"), docCols)
          .withColumn("main_pinned", lit(mainPinned && mainRestored))
          .withColumn("a_rows", lit(aRows))
          .withColumn("b_rows", lit(bRows))
          .withColumn("merged_main", lit(mergedMain))
      },
      Some(s"""WITH b AS (SELECT max(doc_id) // 8 AS lo,
               |                  (3 * max(doc_id)) // 4 AS hi,
               |                  count(*) AS n FROM documents),
               | final AS (
               |  SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
               |   FROM documents d, b WHERE d.doc_id >= b.lo)
               |SELECT *, true AS main_pinned,
               | (SELECT count(*) FROM final)::BIGINT AS a_rows,
               | (SELECT b.n - count(*) + 8 FROM documents, b
               |   WHERE doc_id >= b.hi GROUP BY b.n)::BIGINT AS b_rows,
               | true AS merged_main FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"), "final t")})""".stripMargin)),

    // ---- copy-on-write DELETE on a HIVE-PARTITIONED table: the
    //      per-partition commit — survivors staged in hive layout, doomed
    //      originals retained at their k=v relative paths, FILE-level
    //      moves (untouched partitions never planned, listed, or renamed;
    //      contract-pinned in PlanAuditSpec). Same fingerprint gate as the
    //      flat variant, plus the partition column must survive intact.
    Q("layout_delete_range_partitioned",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val stage = java.nio.file.Files.createTempDirectory("graft_layout_dp").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.repartitionByRange(8, col("doc_id"))
          .write.partitionBy("lang").mode("overwrite").parquet(stage)
        graft.ops.Manifest.create(s, stage, "doc_id")
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        val res = graft.ops.Layout.deleteRange(s, stage, "doc_id", maxId / 4, maxId / 2)
        val after = s.read.parquet(stage)
        graft.functions.Hashing.multisetFingerprintAgg(
          after.select(docCols.map(col): _*), docCols)
          .withColumn("rows_deleted", lit(res.rowsDeleted))
          .withColumn("targeted",
            lit(res.filesRewritten > 0 && res.filesRewritten < res.filesTotal))
      },
      Some(s"""WITH b AS (SELECT max(doc_id) // 4 AS lo, max(doc_id) // 2 AS hi FROM documents)
               |SELECT *,
               | (SELECT count(*) FROM documents, b WHERE doc_id BETWEEN b.lo AND b.hi)::BIGINT AS rows_deleted,
               | true AS targeted FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"),
                   "(SELECT d.* FROM documents d, b WHERE d.doc_id NOT BETWEEN b.lo AND b.hi) t")})""".stripMargin)),

    // ---- copy-on-write MERGE (keyed upsert, the MERGE INTO shape): a
    //      delta of localized updates + out-of-range inserts against a
    //      key-clustered table. The manifest stats target the rewrite to
    //      files that can contain a delta key (broadcast key-vs-stats
    //      join); matched rows are REPLACED, unmatched rows are inserts.
    //      Gate: merged fingerprint ≡ DuckDB's replay of the same merge,
    //      exact updated/inserted counts, strict-subset rewrite.
    Q("layout_merge_keyed",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val stage = java.nio.file.Files.createTempDirectory("graft_layout_m").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.repartitionByRange(8, col("doc_id")).write.mode("overwrite").parquet(stage)
        graft.ops.Manifest.create(s, stage, "doc_id")
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        val (lo, hi) = (maxId / 8, maxId / 4)
        val updates = docs.filter(col("doc_id").between(lo, hi))
          .withColumn("text", concat(lit("v2:"), col("text")))
        val inserts = docs.filter(col("doc_id") < 10)
          .withColumn("doc_id", col("doc_id") + maxId + 1)
        val res = graft.ops.Layout.mergeKeyed(s, stage, "doc_id",
          updates.unionByName(inserts))
        graft.functions.Hashing.multisetFingerprintAgg(s.read.parquet(stage), docCols)
          .withColumn("rows_updated", lit(res.rowsUpdated))
          .withColumn("rows_inserted", lit(res.rowsInserted))
          .withColumn("targeted",
            lit(res.filesRewritten > 0 && res.filesRewritten < res.filesTotal))
      },
      Some(s"""WITH b AS (SELECT max(doc_id) // 8 AS lo, max(doc_id) // 4 AS hi,
               |                  max(doc_id) AS mx FROM documents),
               | merged AS (
               |  SELECT d.* FROM documents d, b WHERE d.doc_id NOT BETWEEN b.lo AND b.hi
               |  UNION ALL
               |  SELECT doc_id, 'v2:' || text, lang, source, n_chars
               |   FROM documents, b WHERE doc_id BETWEEN b.lo AND b.hi
               |  UNION ALL
               |  SELECT doc_id + b.mx + 1, text, lang, source, n_chars
               |   FROM documents, b WHERE doc_id < 10)
               |SELECT *,
               | (SELECT count(*) FROM documents, b WHERE doc_id BETWEEN b.lo AND b.hi)::BIGINT AS rows_updated,
               | 10::BIGINT AS rows_inserted,
               | true AS targeted FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"), "merged t")})""".stripMargin)),

    // ---- per-file BLOOM skipping for point lookups (the Delta/Iceberg
    //      bloom-index shape): lineitem clustered by SHIP DATE, probed by
    //      ORDER KEY — the layout min/max on the probe key spans ~the whole
    //      domain in every file (range stats prune nothing), while the
    //      snapshot's per-file bloom sketches answer "cannot contain key k"
    //      from metadata. The probe runs where the sketches live (a filter
    //      over the snapshot frame — the driver receives surviving paths,
    //      never bloom bytes). Gate: the pruned lookup's fingerprint ≡
    //      DuckDB's direct equality scan (bloom false negatives are
    //      impossible — any lost row flips the hash) + the bloom strictly
    //      beat min/max pruning.
    Q("manifest_bloom_point_scan",
      (s, dir) => {
        val liCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
        val stage = java.nio.file.Files.createTempDirectory("graft_manifest_bf").toString + "/lineitem"
        val li = T(s, dir, "lineitem").select(liCols.map(col): _*)
        li.write.mode("overwrite").parquet(stage)
        graft.ops.Layout.clusterByRange(s, stage, "l_shipdate", nFiles = 12)
        graft.ops.Manifest.createWithBloom(s, stage,
          keyCols = Seq("l_orderkey"), bloomCols = Seq("l_orderkey"))
        // Probe key: the largest orderkey at or below the key-range midpoint —
        // deterministic, guaranteed to exist, uncorrelated with the date layout.
        val b = li.agg(min(col("l_orderkey")), max(col("l_orderkey"))).head()
        val mid = (b.getLong(0) + b.getLong(1)) / 2
        val key = li.filter(col("l_orderkey") <= mid)
          .agg(max(col("l_orderkey"))).head().getLong(0)
        val ks = graft.ops.Manifest.scanKeys(s, stage, "l_orderkey", Seq(key))
        graft.functions.Hashing.multisetFingerprintAgg(ks.rows, liCols)
          .withColumn("bloom_pruned", lit(ks.filesRead < ks.filesRangeCandidates))
      },
      Some(s"""WITH b AS (SELECT (min(l_orderkey) + max(l_orderkey)) // 2 AS mid FROM lineitem),
               | k AS (SELECT max(l_orderkey) AS key FROM lineitem, b WHERE l_orderkey <= b.mid)
               |SELECT *, true AS bloom_pruned FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"),
                   "(SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_shipdate " +
                     "FROM lineitem, k WHERE l_orderkey = k.key) t")})""".stripMargin)),

    // ---- ADDITIVE SCHEMA EVOLUTION through the snapshot layer: each
    //      snapshot records the table schema it saw (a schema.json sidecar
    //      committed atomically with the stats), reads pin that schema
    //      instead of footer-sampling — so after an append introduces a
    //      `score` column, a current read surfaces score on EVERY row
    //      (NULL-backfilled for pre-evolution files), while time travel to
    //      the pre-evolution snapshot reads the HISTORICAL schema without
    //      the column. Type changes fail typed at snapshot time (spec'd).
    //      Gate: the evolved read's fingerprint ≡ DuckDB's UNION replay
    //      with CAST(NULL AS double) backfill + the frozen-old-schema and
    //      as-of-count booleans.
    Q("manifest_schema_evolution",
      (s, dir) => {
        val stage = java.nio.file.Files.createTempDirectory("graft_manifest_ev").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.select(col("doc_id"), col("lang"), col("n_chars"))
          .filter(col("doc_id") % 3 =!= 0)
          .repartition(4).write.mode("overwrite").parquet(stage)
        val snap1 = graft.ops.Manifest.create(s, stage, "doc_id")
        docs.select(col("doc_id"), col("lang"), col("n_chars"))
          .filter(col("doc_id") % 3 === 0)
          .withColumn("score", col("n_chars") * lit(0.5))
          .repartition(2).write.mode("append").parquet(stage)
        val (snap2, _, _) = graft.ops.Manifest.createIncremental(s, stage, "doc_id")
        val cur = graft.ops.Manifest.readAsOf(s, stage, snap2)
        val old = graft.ops.Manifest.readAsOf(s, stage, snap1)
        graft.functions.Hashing.multisetFingerprintAgg(
          cur, Seq("doc_id", "lang", "n_chars", "score"))
          .withColumn("old_schema_frozen", lit(!old.columns.contains("score")))
          .withColumn("n_as_of_1", lit(old.count()))
      },
      Some(s"""SELECT *, true AS old_schema_frozen,
               | (SELECT count(*) FROM documents WHERE doc_id % 3 <> 0)::BIGINT AS n_as_of_1
               |FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "lang", "n_chars", "score"),
                   "(SELECT doc_id, lang, n_chars, CAST(NULL AS double) AS score " +
                     "FROM documents WHERE doc_id % 3 <> 0 " +
                     "UNION ALL " +
                     "SELECT doc_id, lang, n_chars, n_chars * CAST(0.5 AS double) AS score " +
                     "FROM documents WHERE doc_id % 3 = 0) t")})""".stripMargin)),

    // ---- STRING-key bloom lookup (the UUID/URL point-lookup case): string
    //      keys carry no orderable range stats — the manifest rejects them
    //      for min/max, correctly — so the per-file sketch over
    //      xxhash64(key) is the ONLY skipping signal. Fixture: a derived
    //      md5 uid column on a hash-layout table; probe one real uid + one
    //      absent uid. Gate: fingerprint ≡ DuckDB's equality scan over the
    //      same derived uid + the strictly-fewer-files boolean.
    Q("manifest_bloom_uid_scan",
      (s, dir) => {
        val outCols = Seq("doc_id", "lang", "n_chars", "uid")
        val stage = java.nio.file.Files.createTempDirectory("graft_manifest_bfs").toString + "/documents"
        T(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .withColumn("uid", md5(col("doc_id").cast("string")))
          .repartition(8).write.mode("overwrite").parquet(stage)
        graft.ops.Manifest.createWithBloom(s, stage,
          keyCols = Seq("doc_id"), bloomCols = Seq("uid"))
        val target = s.read.parquet(stage)
          .filter(col("doc_id") === 123L).select("uid").head().getString(0)
        val ks = graft.ops.Manifest.scanKeysString(s, stage, "uid",
          Seq(target, "no-such-uid"))
        graft.functions.Hashing.multisetFingerprintAgg(ks.rows, outCols)
          .withColumn("bloom_pruned", lit(ks.filesRead < ks.filesTotal))
      },
      Some(s"""SELECT *, true AS bloom_pruned FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "lang", "n_chars", "uid"),
                   "(SELECT doc_id, lang, n_chars, md5(cast(doc_id as varchar)) AS uid " +
                     "FROM documents WHERE doc_id = 123) t")})""".stripMargin)),

    // ---- CHANGE DATA FEED + retained history: COW mutations move the
    //      files they replace into a hidden trash (reclaimed by vacuum),
    //      so time travel SURVIVES deletes/merges and
    //      `Manifest.changesBetween` can emit the exact row-level feed
    //      between two versions — deletes and inserts (updates as a
    //      delete+insert pair), computed from ONLY the files that differ
    //      between the snapshots (immutable files never decode; carried
    //      rows cancel in the multiset difference). Gate: the feed's
    //      fingerprint ≡ DuckDB replaying the delete+merge as tagged row
    //      sets, plus an as-of read ACROSS both mutations matching the
    //      original table's row count.
    Q("manifest_change_feed",
      (s, dir) => {
        val chCols = Seq("change", "doc_id", "text", "lang", "source", "n_chars")
        val stage = java.nio.file.Files.createTempDirectory("graft_manifest_cdf").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.repartitionByRange(8, col("doc_id")).write.mode("overwrite").parquet(stage)
        val snap1 = graft.ops.Manifest.create(s, stage, "doc_id")
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        graft.ops.Layout.deleteRange(s, stage, "doc_id", maxId / 4, maxId / 2)
        val updates = docs.filter(col("doc_id") < maxId / 8)
          .withColumn("text", concat(lit("v2:"), col("text")))
        val inserts = docs.filter(col("doc_id") < 10)
          .withColumn("doc_id", col("doc_id") + maxId + 1)
        graft.ops.Layout.mergeKeyed(s, stage, "doc_id",
          updates.unionByName(inserts))
        val snapN = graft.ops.Manifest.latestSnapshotId(s, stage).get
        // Through the PUBLIC source surface (spark.read.format("graft")) —
        // the engine's CDF and time travel are user-composable reads, not
        // internal Scala calls.
        val feed = s.read.format("graft")
          .option("changesFrom", snap1).option("changesTo", snapN).load(stage)
        val asOf1 = s.read.format("graft")
          .option("snapshotId", snap1).load(stage)
        graft.functions.Hashing.multisetFingerprintAgg(feed, chCols)
          .withColumn("n_as_of_1", lit(asOf1.count()))
      },
      Some(s"""WITH b AS (SELECT max(doc_id) AS mx FROM documents),
               | feed AS (
               |  SELECT 'delete' AS change, d.* FROM documents d, b
               |   WHERE doc_id BETWEEN b.mx // 4 AND b.mx // 2
               |  UNION ALL
               |  SELECT 'delete', d.* FROM documents d, b WHERE doc_id < b.mx // 8
               |  UNION ALL
               |  SELECT 'insert', doc_id, 'v2:' || text, lang, source, n_chars
               |   FROM documents, b WHERE doc_id < b.mx // 8
               |  UNION ALL
               |  SELECT 'insert', doc_id + b.mx + 1, text, lang, source, n_chars
               |   FROM documents, b WHERE doc_id < 10)
               |SELECT *, (SELECT count(*) FROM documents)::BIGINT AS n_as_of_1 FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("change", "doc_id", "text", "lang", "source", "n_chars"), "feed t")})""".stripMargin)),

    // ---- metadata-accelerated range COUNT: files fully inside the range
    //      are counted from the snapshot's per-file non-null key counts
    //      (zero data reads — the Iceberg/Delta COUNT(*) fast path); only
    //      the boundary files are scanned. At 100 TB a selective count is
    //      metadata + a handful of edge files. Gate: the count matches
    //      DuckDB exactly AND only a strict subset of files was scanned.
    Q("manifest_count_range",
      (s, dir) => {
        val stage = java.nio.file.Files.createTempDirectory("graft_manifest_cnt").toString + "/documents"
        T(s, dir, "documents").repartition(8).write.mode("overwrite").parquet(stage)
        graft.ops.Layout.clusterByRange(s, stage, "doc_id", nFiles = 8)
        graft.ops.Manifest.create(s, stage, "doc_id")
        val (cnt, boundary, total) =
          graft.ops.Manifest.countRange(s, stage, "doc_id", 100L, 350L)
        // Global MIN/MAX folded from the same snapshot — zero data reads
        // (the manifest-answered aggregate).
        val (mn, mx) = graft.ops.Manifest.minMax(s, stage, "doc_id").get
        s.range(1).select(
          lit(cnt).as("n_in_range"),
          lit(boundary < total).as("metadata_fast_path"),
          lit(total).cast("long").as("n_files"),
          lit(mn).as("key_min"), lit(mx).as("key_max"))
      },
      Some("""SELECT (SELECT count(*) FROM documents
              |        WHERE doc_id BETWEEN 100 AND 350)::bigint AS n_in_range,
              | true AS metadata_fast_path, 8::bigint AS n_files,
              | min(doc_id) AS key_min, max(doc_id) AS key_max
              |FROM documents""".stripMargin)),

    // ---- temporal-key skipping end-to-end (the time-travel shape every
    //      event table needs): events range-clustered on ts, manifest stats
    //      in epoch MICROS (the normalized long unit for timestamp keys),
    //      and a quartile time-window scan that reads only the overlapping
    //      files. The oracle replays the same window arithmetic via
    //      epoch_us, so the micros normalization itself is hash-gated.
    Q("manifest_ts_range_scan",
      (s, dir) => {
        val ev = Registry.events(s, dir)
        val stage = java.nio.file.Files.createTempDirectory("graft_manifest_ts").toString + "/events"
        ev.write.mode("overwrite").parquet(stage)
        graft.ops.Layout.clusterByRange(s, stage, "ts", nFiles = 6)
        graft.ops.Manifest.create(s, stage, "ts")
        val b = s.read.parquet(stage)
          .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
        val (mn, mx) = (b.getLong(0), b.getLong(1))
        val (lo, hi) = (mn + (mx - mn) / 4, mn + (mx - mn) / 2)
        val (rows, nRead, nTotal) = graft.ops.Manifest.scanRange(s, stage, "ts", lo, hi)
        rows.agg(
          count(lit(1)).as("n_rows"),
          coalesce(sum(col("event_id").cast("decimal(20,0)")), lit(0))
            .cast("long").as("sum_event_id"),
          lit(nRead < nTotal).as("files_pruned"))
      },
      Some("""WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events)
              |SELECT count(*)::bigint AS n_rows,
              | coalesce(cast(sum(event_id) as bigint), 0) AS sum_event_id,
              | true AS files_pruned
              |FROM events, b
              |WHERE epoch_us(ts) BETWEEN mn + (mx - mn) // 4 AND mn + (mx - mn) // 2""".stripMargin)),

    // ---- snapshot-diff incremental processing: a recurring job over an
    //      append-only table reads ONLY the files added since its previous
    //      snapshot (latest ∖ since, by path — immutable snapshots as the
    //      source of truth, no mtime heuristics). Fixture: batch 1 lands,
    //      snapshot; batch 2 appends, snapshot; the increment must be
    //      EXACTLY batch 2 — fingerprint-gated against DuckDB computing
    //      batch 2's membership directly, plus the only-new-files boolean.
    Q("manifest_incremental_scan",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val stage = java.nio.file.Files.createTempDirectory("graft_manifest_inc").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.filter(col("doc_id") % 3 =!= 0)
          .repartition(4).write.mode("overwrite").parquet(stage)
        val id1 = graft.ops.Manifest.create(s, stage, "doc_id")
        docs.filter(col("doc_id") % 3 === 0)
          .repartition(2).write.mode("append").parquet(stage)
        graft.ops.Manifest.create(s, stage, "doc_id")
        val (rows, nAdded) = graft.ops.Manifest.addedSince(s, stage, id1)
        graft.functions.Hashing.multisetFingerprintAgg(rows, docCols)
          .withColumn("incremental_ok", lit(nAdded == 2))
      },
      Some(s"""SELECT *, true AS incremental_ok FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"),
                   "(SELECT * FROM documents WHERE doc_id % 3 = 0) t")})""".stripMargin)),

    // ---- snapshot HISTORY (DESCRIBE HISTORY analog): one row per
    //      retained snapshot with row count and stats coverage — the
    //      introspection a table-format user audits retention with.
    //      Deterministic columns only (file counts are AQE-layout trivia,
    //      commit times are wall clock); the lifecycle is create →
    //      incremental append → COW delete, so the three rows pin all
    //      three commit paths.
    Q("manifest_history",
      (s, dir) => {
        val stage = java.nio.file.Files.createTempDirectory("graft_manifest_hist").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.filter(col("doc_id") % 3 =!= 0)
          .repartition(4).write.mode("overwrite").parquet(stage)
        graft.ops.Manifest.create(s, stage, "doc_id")
        docs.filter(col("doc_id") % 3 === 0)
          .repartition(2).write.mode("append").parquet(stage)
        graft.ops.Manifest.createIncremental(s, stage, "doc_id")
        graft.ops.Layout.deleteRange(s, stage, "doc_id", 0L, 9L)
        graft.ops.Manifest.history(s, stage)
          .select(col("snapshot"), col("n_rows"), col("key_cols"))
      },
      Some("""SELECT 1 AS snapshot,
              | (SELECT count(*) FROM documents WHERE doc_id % 3 <> 0)::BIGINT AS n_rows,
              | 'doc_id' AS key_cols
              |UNION ALL SELECT 2, (SELECT count(*) FROM documents)::BIGINT, 'doc_id'
              |UNION ALL SELECT 3,
              | (SELECT count(*) FROM documents WHERE doc_id > 9)::BIGINT, 'doc_id'
              |ORDER BY 1""".stripMargin)),

    // ---- RESTORE (roll back as a FORWARD commit): create → COW delete →
    //      append, then restore to snapshot 1 — trash-resident files
    //      revived by copy, the appended files retired, history never
    //      rewritten (the pre-restore state stays as-of readable), and a
    //      LATER delete proves the restored state is fully mutable. Gate:
    //      final fingerprint ≡ DuckDB replaying restore-then-delete
    //      (= the original corpus minus the SECOND delete only), plus the
    //      pre-restore state's row count surviving as history.
    Q("manifest_restore",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val stage = java.nio.file.Files.createTempDirectory("graft_restore").toString + "/documents"
        val docs = T(s, dir, "documents")
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        docs.repartitionByRange(6, col("doc_id")).write.parquet(stage)
        val id1 = graft.ops.Manifest.create(s, stage, "doc_id")
        graft.ops.Layout.deleteRange(s, stage, "doc_id", maxId / 4, maxId / 2)
        docs.filter(col("doc_id") < 10)
          .withColumn("doc_id", col("doc_id") + maxId + 1)
          .write.mode("append").parquet(stage)
        graft.ops.Manifest.createIncremental(s, stage, "doc_id") // snapshot 3
        val preRestoreN = s.read.parquet(stage).count()
        val r = graft.ops.Layout.restoreSnapshot(s, stage, id1)  // snapshot 4
        // The restored state is fully mutable: a SECOND, different delete.
        graft.ops.Layout.deleteRange(s, stage, "doc_id",
          3 * maxId / 4, maxId)                                  // snapshot 5
        val historyN = graft.ops.Manifest.readAsOf(s, stage, 3).count()
        graft.functions.Hashing.multisetFingerprintAgg(
            s.read.parquet(stage), docCols)
          .withColumn("revived_and_retired", lit(r.revived > 0 && r.retired > 0))
          .withColumn("history_intact", lit(historyN == preRestoreN))
      },
      Some(s"""WITH b AS (SELECT max(doc_id) AS mx FROM documents)
               |SELECT *, true AS revived_and_retired, true AS history_intact FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"),
                   ("(SELECT d.* FROM documents d, b " +
                    "WHERE d.doc_id NOT BETWEEN 3 * b.mx // 4 AND b.mx) t"))})""".stripMargin)),

    // ---- snapshot TAGS: a named ref ('baseline') into retained history —
    //      resolvable by SQL VERSION AS OF '<name>', and PINNING its
    //      snapshot against expireSnapshots (the Iceberg tag-retention
    //      contract). Fixture: tag snapshot 1, mutate twice, expire to 1 —
    //      only the untagged middle snapshot dies; the tag still reads the
    //      ORIGINAL corpus exactly (≡ DuckDB), through the vacuum too.
    Q("sql_time_travel_tag",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val stage = java.nio.file.Files.createTempDirectory("graft_tag").toString + "/documents"
        val docs = T(s, dir, "documents")
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        docs.repartitionByRange(4, col("doc_id")).write.parquet(stage)
        val id1 = graft.ops.Manifest.create(s, stage, "doc_id")
        s.sql(s"CALL graft.system.tag('$stage', 'baseline', $id1)")
        graft.ops.Layout.deleteRange(s, stage, "doc_id", 0L, maxId / 4) // snap 2
        docs.filter(col("doc_id") < 10)
          .withColumn("doc_id", col("doc_id") + maxId + 1)
          .write.mode("append").parquet(stage)
        graft.ops.Manifest.createIncremental(s, stage, "doc_id")        // snap 3
        val expired = s.sql(
          s"CALL graft.system.expire_snapshots('$stage', 1)").head().getLong(0)
        s.sql(s"CALL graft.system.vacuum('$stage')")
        graft.functions.Hashing.multisetFingerprintAgg(
            s.sql(s"SELECT * FROM graft.`$stage` VERSION AS OF 'baseline'"),
            docCols)
          .withColumn("only_untagged_expired", lit(expired == 1L))
          .withColumn("tag_resolves",
            lit(graft.ops.Manifest.tags(s, stage) == Map("baseline" -> id1)))
      },
      Some(s"""SELECT *, true AS only_untagged_expired, true AS tag_resolves FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"), "documents")})""".stripMargin)),

    // ---- TIME TRAVEL: after batch 2 lands and is snapshotted, an as-of
    //      read of snapshot 1 must return EXACTLY batch 1 (fingerprint-
    //      gated against DuckDB computing batch 1's membership directly) —
    //      the Iceberg/Delta VERSION AS OF, answered from the same
    //      immutable file-list snapshots that drive pruning and
    //      snapshot-diff increments. latest_n pins that the CURRENT read
    //      still sees everything (time travel is a view, not a rollback).
    Q("manifest_time_travel",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val stage = java.nio.file.Files.createTempDirectory("graft_manifest_tt").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.filter(col("doc_id") % 3 =!= 0)
          .repartition(4).write.mode("overwrite").parquet(stage)
        val id1 = graft.ops.Manifest.create(s, stage, "doc_id")
        docs.filter(col("doc_id") % 3 === 0)
          .repartition(2).write.mode("append").parquet(stage)
        graft.ops.Manifest.createIncremental(s, stage, "doc_id")
        // Through the PUBLIC SQL surface: the catalog serves VERSION AS OF
        // as a NATIVE v2 parquet scan (no Row-conversion tax — the V1
        // format("graft") path measured ~1.5× on this fixture), and the
        // bare identifier is the latest snapshot's blessed read.
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val asOf1 = s.sql(s"SELECT * FROM graft.`$stage` VERSION AS OF $id1")
        graft.functions.Hashing.multisetFingerprintAgg(asOf1, docCols)
          .withColumn("latest_n",
            lit(s.sql(s"SELECT * FROM graft.`$stage`").count()))
      },
      Some(s"""SELECT *, (SELECT count(*) FROM documents)::BIGINT AS latest_n FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"),
                   "(SELECT * FROM documents WHERE doc_id % 3 <> 0) t")})""".stripMargin)),

    // ---- schema evolution BEYOND additive: column DROP + type WIDENING
    //      without a table rewrite (Manifest.updateSchema — one metadata
    //      commit carrying the stats rows verbatim; data files untouched,
    //      the parquet reader's widening decode serves old narrow files at
    //      the new type). Time travel still returns each snapshot's OWN
    //      schema. Gate: post-evolution fingerprint ≡ DuckDB over the same
    //      columns, structural flags (dropped gone / widened type / old
    //      shape as-of / zero files touched) all true.
    Q("manifest_schema_evolve_dw",
      (s, dir) => {
        import org.apache.spark.sql.types.{IntegerType, LongType}
        val stage = java.nio.file.Files.createTempDirectory("graft_m_dw").toString + "/documents"
        val docs = T(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("lang"),
            col("n_chars").cast("int").as("n_chars"),
            lit("scratch").as("tmp_note"))
        docs.filter(col("doc_id") % 2 === 0).repartition(3)
          .write.mode("overwrite").parquet(stage)
        val id1 = graft.ops.Manifest.create(s, stage, "doc_id")
        val fs = new org.apache.hadoop.fs.Path(stage)
          .getFileSystem(s.sessionState.newHadoopConf())
        val filesBefore = graft.ops.FsMaint.dataFileCount(fs,
          new org.apache.hadoop.fs.Path(stage))
        graft.ops.Manifest.widenColumn(s, stage, "n_chars", LongType)
        graft.ops.Manifest.dropColumn(s, stage, "tmp_note")
        val metadataOnly = graft.ops.FsMaint.dataFileCount(fs,
          new org.apache.hadoop.fs.Path(stage)) == filesBefore
        // Post-evolution appends arrive in the NEW shape; incremental
        // snapshots keep working over the mixed (narrow+wide) files.
        docs.filter(col("doc_id") % 2 === 1)
          .withColumn("n_chars", col("n_chars").cast("long")).drop("tmp_note")
          .repartition(2).write.mode("append").parquet(stage)
        graft.ops.Manifest.createIncremental(s, stage, "doc_id")
        val latest = graft.ops.Manifest.readAsOf(s, stage,
          graft.ops.Manifest.latestSnapshotId(s, stage).get)
        val asOf1 = graft.ops.Manifest.readAsOf(s, stage, id1)
        val evCols = Seq("doc_id", "text", "lang", "n_chars")
        graft.functions.Hashing.multisetFingerprintAgg(
            latest.select(evCols.map(col): _*), evCols)
          .withColumn("latest_dropped", lit(!latest.columns.contains("tmp_note")))
          .withColumn("latest_widened",
            lit(latest.schema("n_chars").dataType == LongType))
          .withColumn("asof_old_shape", lit(asOf1.columns.contains("tmp_note") &&
            asOf1.schema("n_chars").dataType == IntegerType))
          .withColumn("metadata_only", lit(metadataOnly))
      },
      Some(s"""SELECT *, true AS latest_dropped, true AS latest_widened,
               | true AS asof_old_shape, true AS metadata_only FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "n_chars"),
                   "(SELECT doc_id, text, lang, n_chars FROM documents) t")})""".stripMargin)),

    // ---- SQL DDL lifecycle: CREATE TABLE ... AS SELECT bootstraps an
    //      EMPTY manifested table (snapshot 1: zero file rows, recorded
    //      schema, stats keys from TBLPROPERTIES('graft.keys')), the CTAS
    //      SELECT and a later INSERT land as incremental snapshots, DELETE
    //      targets via the manifest, DROP TABLE removes the managed dir
    //      under the table lock. One snapshot per commit (dense ids) is the
    //      structural gate; the fingerprint is computed BEFORE the drop.
    Q("sql_ctas_lifecycle",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val stage = java.nio.file.Files.createTempDirectory("graft_ctas").toString + "/created"
        val docs = T(s, dir, "documents")
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        docs.filter(col("doc_id") % 2 === 0).createOrReplaceTempView("ctas_src_even")
        docs.filter(col("doc_id") % 2 === 1).createOrReplaceTempView("ctas_src_odd")
        s.sql(s"CREATE TABLE graft.`$stage` TBLPROPERTIES('graft.keys'='doc_id') " +
          "AS SELECT * FROM ctas_src_even")
        s.sql(s"INSERT INTO graft.`$stage` SELECT * FROM ctas_src_odd")
        s.sql(s"DELETE FROM graft.`$stage` " +
          s"WHERE doc_id BETWEEN ${maxId / 4} AND ${maxId / 2}")
        val fpRow = graft.functions.Hashing.multisetFingerprintAgg(
          s.read.parquet(stage), docCols).head()
        val denseSnapshots =
          graft.ops.Manifest.latestSnapshotId(s, stage).contains(4)
        s.sql(s"DROP TABLE graft.`$stage`")
        val dropped = !new org.apache.hadoop.fs.Path(stage)
          .getFileSystem(s.sessionState.newHadoopConf())
          .exists(new org.apache.hadoop.fs.Path(stage))
        import s.implicits._
        Seq((fpRow.getString(0), fpRow.getLong(1), denseSnapshots, dropped))
          .toDF("fingerprint", "n_rows", "snapshot_per_commit", "dropped")
      },
      Some(s"""WITH b AS (SELECT max(doc_id) AS mx FROM documents)
               |SELECT *, true AS snapshot_per_commit, true AS dropped FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"),
                   "(SELECT d.* FROM documents d, b WHERE d.doc_id NOT BETWEEN b.mx // 4 AND b.mx // 2) t")})""".stripMargin)),

    // ---- the WRITABLE SQL surface, end to end: DELETE FROM (manifest-
    //      targeted COW via SupportsDelete), MERGE INTO (keyed whole-row
    //      upsert via the extension rule), INSERT INTO (appended files +
    //      incremental snapshot) — all engine-executed statements over the
    //      graft catalog, the reference's statement-driven write path
    //      (TableConnection.php:367-387, Synchronizer.php:496-507) on the
    //      table format. Gate: final fingerprint ≡ DuckDB's replay of the
    //      same three statements, plus exact per-statement row outcomes.
    Q("sql_dml_cow",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val stage = java.nio.file.Files.createTempDirectory("graft_sql_dml").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.repartitionByRange(8, col("doc_id")).write.mode("overwrite").parquet(stage)
        graft.ops.Manifest.create(s, stage, "doc_id")
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        val nBefore = s.read.parquet(stage).count()
        s.sql(s"DELETE FROM graft.`$stage` " +
          s"WHERE doc_id BETWEEN ${maxId / 4} AND ${maxId / 2}")
        val nAfterDelete = s.read.parquet(stage).count()
        docs.filter(col("doc_id") < maxId / 8)
          .withColumn("text", concat(lit("v2:"), col("text")))
          .unionByName(docs.filter(col("doc_id") < 10)
            .withColumn("doc_id", col("doc_id") + maxId + 1))
          .createOrReplaceTempView("sql_dml_delta")
        val m = s.sql(
          s"""MERGE INTO graft.`$stage` t USING sql_dml_delta s
             |ON t.doc_id = s.doc_id
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head()
        docs.filter(col("doc_id") < 5)
          .withColumn("doc_id", col("doc_id") + 2L * maxId + 2L)
          .createOrReplaceTempView("sql_dml_ins")
        s.sql(s"INSERT INTO graft.`$stage` SELECT * FROM sql_dml_ins")
        val u = s.sql(s"UPDATE graft.`$stage` " +
          s"SET source = 'sqlupd', n_chars = n_chars + 7 " +
          s"WHERE doc_id BETWEEN ${maxId / 2 + 1} AND ${5 * maxId / 8}").head()
        graft.functions.Hashing.multisetFingerprintAgg(s.read.parquet(stage), docCols)
          .withColumn("rows_deleted", lit(nBefore - nAfterDelete))
          .withColumn("rows_updated", lit(m.getLong(m.fieldIndex("rows_updated"))))
          .withColumn("rows_inserted", lit(m.getLong(m.fieldIndex("rows_inserted"))))
          .withColumn("rows_updated2", lit(u.getLong(u.fieldIndex("rows_updated"))))
      },
      Some(s"""WITH b AS (SELECT max(doc_id) // 8 AS u, max(doc_id) // 4 AS lo,
               |                  max(doc_id) // 2 AS hi, max(doc_id) AS mx FROM documents),
               | afterdel AS (SELECT d.* FROM documents d, b
               |              WHERE d.doc_id NOT BETWEEN b.lo AND b.hi),
               | final AS (
               |  SELECT a.doc_id,
               |    CASE WHEN a.doc_id < b.u THEN 'v2:' || a.text ELSE a.text END AS text,
               |    a.lang, a.source, a.n_chars FROM afterdel a, b
               |  UNION ALL
               |  SELECT doc_id + b.mx + 1, text, lang, source, n_chars
               |   FROM documents, b WHERE doc_id < 10
               |  UNION ALL
               |  SELECT doc_id + 2 * b.mx + 2, text, lang, source, n_chars
               |   FROM documents, b WHERE doc_id < 5),
               | final2 AS (
               |  SELECT f.doc_id, f.text, f.lang,
               |    CASE WHEN f.doc_id BETWEEN b.mx // 2 + 1 AND (5 * b.mx) // 8
               |         THEN 'sqlupd' ELSE f.source END AS source,
               |    CASE WHEN f.doc_id BETWEEN b.mx // 2 + 1 AND (5 * b.mx) // 8
               |         THEN f.n_chars + 7 ELSE f.n_chars END AS n_chars
               |  FROM final f, b)
               |SELECT *,
               | (SELECT count(*) FROM documents, b WHERE doc_id BETWEEN b.lo AND b.hi)::BIGINT AS rows_deleted,
               | (SELECT count(*) FROM documents, b WHERE doc_id < b.u)::BIGINT AS rows_updated,
               | 10::BIGINT AS rows_inserted,
               | (SELECT count(*) FROM final f, b
               |   WHERE f.doc_id BETWEEN b.mx // 2 + 1 AND (5 * b.mx) // 8)::BIGINT AS rows_updated2
               |FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"), "final2 t")})""".stripMargin)),

    // ---- the GENERAL row-level MERGE: conditional WHEN MATCHED UPDATE
    //      (partial SET, condition touching BOTH target and source rows),
    //      WHEN MATCHED DELETE (the reference's keyed-delete semantic,
    //      TableConnection.php:367-387, as the standard SQL statement),
    //      conditional WHEN NOT MATCHED INSERT with an explicit column
    //      list (unlisted columns NULL), matched rows with NO applicable
    //      clause surviving untouched — one statement, one journaled COW
    //      commit. Gate: final fingerprint ≡ DuckDB's replay of the same
    //      clause semantics, exact per-action row counts, and the plan
    //      contract that exactly the source-key-overlapping files were
    //      replaced (files without matched keys never plan).
    Q("sql_merge_delete",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val stage = java.nio.file.Files.createTempDirectory("graft_sql_mrg").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.repartitionByRange(8, col("doc_id")).write.mode("overwrite").parquet(stage)
        graft.ops.Manifest.create(s, stage, "doc_id")
        val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
        val srcCols = Seq(col("doc_id"), col("text").as("text2"),
          col("n_chars").as("nc"))
        val delta = docs.filter(col("doc_id") < mx / 8)
          .select(srcCols :+ lit("u").as("mark"): _*)
          .unionByName(docs
            .filter(col("doc_id").between(mx / 4, mx / 4 + mx / 8 - 1))
            .select(srcCols :+ lit("d").as("mark"): _*))
          .unionByName(docs
            .filter(col("doc_id").between(5 * mx / 8, 5 * mx / 8 + 9))
            .select(srcCols :+ lit("x").as("mark"): _*))        // matched no-op
          .unionByName(docs.filter(col("doc_id") < 10)
            .select((col("doc_id") + mx + 1).as("doc_id") +: srcCols.tail
              :+ lit("i").as("mark"): _*))                       // inserts
          .unionByName(docs.filter(col("doc_id") === 0)
            .select((col("doc_id") + mx + 1000000L).as("doc_id") +: srcCols.tail
              :+ lit("x").as("mark"): _*))                       // unmatched no-op
        delta.createOrReplaceTempView("sql_mrg_src")
        val snap = graft.ops.Manifest.files(s, stage)
        val beforeFiles = snap.select("file").collect().map(_.getString(0)).toSet
        val overlapping = snap.join(
            broadcast(delta.select(col("doc_id").as("__k"))),
            col("__k").between(col("min_doc_id"), col("max_doc_id")), "left_semi")
          .select("file").collect().map(_.getString(0)).toSet
        val m = s.sql(
          s"""MERGE INTO graft.`$stage` t USING sql_mrg_src s
             |ON t.doc_id = s.doc_id
             |WHEN MATCHED AND s.mark = 'u' AND t.n_chars >= 0
             |  THEN UPDATE SET text = concat('m:', s.text2), n_chars = t.n_chars + 11
             |WHEN MATCHED AND s.mark = 'd' THEN DELETE
             |WHEN NOT MATCHED AND s.mark = 'i'
             |  THEN INSERT (doc_id, text, source, n_chars)
             |  VALUES (s.doc_id, s.text2, 'merged', s.nc)""".stripMargin).head()
        val afterFiles = graft.ops.Manifest.files(s, stage).select("file")
          .collect().map(_.getString(0)).toSet
        val targeted = (beforeFiles -- afterFiles) == overlapping
        graft.functions.Hashing.multisetFingerprintAgg(s.read.parquet(stage), docCols)
          .withColumn("rows_updated", lit(m.getLong(m.fieldIndex("rows_updated"))))
          .withColumn("rows_deleted", lit(m.getLong(m.fieldIndex("rows_deleted"))))
          .withColumn("rows_inserted", lit(m.getLong(m.fieldIndex("rows_inserted"))))
          .withColumn("targeted", lit(targeted))
      },
      Some(s"""WITH b AS (SELECT max(doc_id) AS mx FROM documents),
               | final AS (
               |  SELECT d.doc_id,
               |    CASE WHEN d.doc_id < b.mx // 8 THEN 'm:' || d.text ELSE d.text END AS text,
               |    d.lang, d.source,
               |    CASE WHEN d.doc_id < b.mx // 8 THEN d.n_chars + 11 ELSE d.n_chars END AS n_chars
               |  FROM documents d, b
               |  WHERE d.doc_id NOT BETWEEN b.mx // 4 AND b.mx // 4 + b.mx // 8 - 1
               |  UNION ALL
               |  SELECT d.doc_id + b.mx + 1, d.text, NULL::VARCHAR, 'merged', d.n_chars
               |  FROM documents d, b WHERE d.doc_id < 10)
               |SELECT *,
               | (SELECT count(*) FROM documents, b WHERE doc_id < b.mx // 8)::BIGINT AS rows_updated,
               | (SELECT count(*) FROM documents, b
               |   WHERE doc_id BETWEEN b.mx // 4 AND b.mx // 4 + b.mx // 8 - 1)::BIGINT AS rows_deleted,
               | 10::BIGINT AS rows_inserted,
               | true AS targeted
               |FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"), "final t")})""".stripMargin)),

    // ---- the reference's WHOLE SYNC as ONE statement: MERGE with upsert
    //      clauses plus WHEN NOT MATCHED BY SOURCE THEN DELETE makes the
    //      target exactly the source (Synchronizer.php:34-102's
    //      delete-extra/copy-missing/replace-different cascade as standard
    //      SQL). BY SOURCE semantically plans the whole table (un-matched
    //      rows can be anywhere), but the COMMIT narrows to files holding
    //      affected rows. Gate: post-merge fingerprint ≡ DuckDB over the
    //      source expression, exact updated/deleted/inserted counts.
    Q("sql_merge_by_source",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val stage = java.nio.file.Files.createTempDirectory("graft_sql_mbs").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.repartitionByRange(8, col("doc_id")).write.mode("overwrite").parquet(stage)
        graft.ops.Manifest.create(s, stage, "doc_id")
        val src = docs.filter(col("doc_id") % 3 === 0)
          .withColumn("text", concat(lit("s:"), col("text")))
        src.createOrReplaceTempView("sql_mbs_src")
        val m = s.sql(
          s"""MERGE INTO graft.`$stage` t USING sql_mbs_src s
             |ON t.doc_id = s.doc_id
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *
             |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin).head()
        graft.functions.Hashing.multisetFingerprintAgg(s.read.parquet(stage), docCols)
          .withColumn("rows_updated", lit(m.getLong(m.fieldIndex("rows_updated"))))
          .withColumn("rows_deleted", lit(m.getLong(m.fieldIndex("rows_deleted"))))
          .withColumn("rows_inserted", lit(m.getLong(m.fieldIndex("rows_inserted"))))
      },
      Some(s"""SELECT *,
               | (SELECT count(*) FROM documents WHERE doc_id % 3 = 0)::BIGINT AS rows_updated,
               | (SELECT count(*) FROM documents WHERE doc_id % 3 <> 0)::BIGINT AS rows_deleted,
               | 0::BIGINT AS rows_inserted FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"),
                   "(SELECT doc_id, 's:' || text AS text, lang, source, n_chars " +
                     "FROM documents WHERE doc_id % 3 = 0) t")})""".stripMargin)),

    // ---- SQL DDL schema evolution: ALTER TABLE ALTER COLUMN TYPE (widen),
    //      DROP COLUMN, ADD COLUMN through the catalog — the statement
    //      surface of Manifest.updateSchema's metadata-only evolution (the
    //      Scala-API twin is manifest_schema_evolve_dw). A post-evolution
    //      INSERT lands in the NEW shape; old files read NULL for the added
    //      column and widen on decode. Gate: fingerprint over the evolved
    //      shape ≡ DuckDB, structural flags (dropped gone / widened / as-of
    //      old shape / zero files touched) all true.
    Q("sql_alter_evolution",
      (s, dir) => {
        import org.apache.spark.sql.types.{IntegerType, LongType}
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val stage = java.nio.file.Files.createTempDirectory("graft_sql_alter").toString + "/documents"
        val docs = T(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("lang"),
            col("n_chars").cast("int").as("n_chars"),
            lit("scratch").as("tmp_note"))
        docs.filter(col("doc_id") % 2 === 0).repartition(3)
          .write.mode("overwrite").parquet(stage)
        val id1 = graft.ops.Manifest.create(s, stage, "doc_id")
        val fs = new org.apache.hadoop.fs.Path(stage)
          .getFileSystem(s.sessionState.newHadoopConf())
        val filesBefore = graft.ops.FsMaint.dataFileCount(fs,
          new org.apache.hadoop.fs.Path(stage))
        s.sql(s"ALTER TABLE graft.`$stage` ALTER COLUMN n_chars TYPE BIGINT")
        s.sql(s"ALTER TABLE graft.`$stage` DROP COLUMN tmp_note")
        s.sql(s"ALTER TABLE graft.`$stage` ADD COLUMN note STRING")
        val metadataOnly = graft.ops.FsMaint.dataFileCount(fs,
          new org.apache.hadoop.fs.Path(stage)) == filesBefore
        docs.filter(col("doc_id") % 2 === 1)
          .withColumn("n_chars", col("n_chars").cast("long")).drop("tmp_note")
          .withColumn("note", concat(lit("n"), col("doc_id")))
          .createOrReplaceTempView("sql_alter_ins")
        s.sql(s"INSERT INTO graft.`$stage` SELECT * FROM sql_alter_ins")
        val latest = s.sql(s"SELECT * FROM graft.`$stage`")
        val asOf1 = s.sql(s"SELECT * FROM graft.`$stage` VERSION AS OF $id1")
        val evCols = Seq("doc_id", "text", "lang", "n_chars", "note")
        graft.functions.Hashing.multisetFingerprintAgg(
            latest.select(evCols.map(col): _*), evCols)
          .withColumn("latest_dropped", lit(!latest.columns.contains("tmp_note")))
          .withColumn("latest_widened",
            lit(latest.schema("n_chars").dataType == LongType))
          .withColumn("asof_old_shape", lit(asOf1.columns.contains("tmp_note") &&
            asOf1.schema("n_chars").dataType == IntegerType))
          .withColumn("metadata_only", lit(metadataOnly))
      },
      Some(s"""SELECT *, true AS latest_dropped, true AS latest_widened,
               | true AS asof_old_shape, true AS metadata_only FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "n_chars", "note"),
                   ("(SELECT doc_id, text, lang, n_chars, CASE WHEN doc_id % 2 = 1 " +
                    "THEN 'n' || doc_id ELSE NULL END AS note FROM documents) t"))})""".stripMargin)),

    // ---- ALTER TABLE RENAME COLUMN: metadata-only via logical→physical
    //      name indirection (data files keep the original physical column
    //      name forever; each snapshot's recorded schema carries its own
    //      logical names — Manifest.renameColumn). A post-rename INSERT
    //      lands under the rename (new files still write the PHYSICAL
    //      name, preserving the one-physical-schema invariant), reads and
    //      filter pushdown serve the original VALUES under the new name,
    //      and time travel answers under each snapshot's own names. Gate:
    //      fingerprint over the renamed shape ≡ DuckDB, plus structural
    //      flags (zero files touched / as-of shows the old name / raw
    //      footers keep the physical name).
    Q("sql_alter_rename",
      (s, dir) => {
        val cols = Seq("doc_id", "text", "lang", "origin", "n_chars")
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val stage = java.nio.file.Files.createTempDirectory("graft_sql_ren").toString + "/documents"
        val docs = T(s, dir, "documents")
        docs.filter(col("doc_id") % 2 === 0).repartition(3)
          .write.mode("overwrite").parquet(stage)
        val id1 = graft.ops.Manifest.create(s, stage, "doc_id")
        val fs = new org.apache.hadoop.fs.Path(stage)
          .getFileSystem(s.sessionState.newHadoopConf())
        val filesBefore = graft.ops.FsMaint.dataFileCount(fs,
          new org.apache.hadoop.fs.Path(stage))
        s.sql(s"ALTER TABLE graft.`$stage` RENAME COLUMN source TO origin")
        val metadataOnly = graft.ops.FsMaint.dataFileCount(fs,
          new org.apache.hadoop.fs.Path(stage)) == filesBefore
        docs.filter(col("doc_id") % 2 === 1).withColumnRenamed("source", "origin")
          .createOrReplaceTempView("sql_ren_ins")
        s.sql(s"INSERT INTO graft.`$stage` SELECT * FROM sql_ren_ins")
        val latest = s.sql(s"SELECT * FROM graft.`$stage`")
        val asOf1 = s.sql(s"SELECT * FROM graft.`$stage` VERSION AS OF $id1")
        val raw = s.read.option("mergeSchema", "true").parquet(stage)
        graft.functions.Hashing.multisetFingerprintAgg(
            latest.select(cols.map(col): _*), cols)
          .withColumn("metadata_only", lit(metadataOnly))
          .withColumn("asof_old_name", lit(asOf1.columns.contains("source") &&
            !asOf1.columns.contains("origin")))
          .withColumn("physical_kept", lit(raw.columns.contains("source") &&
            !raw.columns.contains("origin")))
      },
      Some(s"""SELECT *, true AS metadata_only, true AS asof_old_name,
               | true AS physical_kept FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "origin", "n_chars"),
                   "(SELECT doc_id, text, lang, source AS origin, n_chars FROM documents) t")})""".stripMargin)),

    // ---- SQL CALL surface: the table-maintenance jobs (compaction,
    //      range re-clustering, snapshot expiry, vacuum) as engine-executed
    //      statements over the graft catalog's `system` namespace — the
    //      Iceberg-procedure posture on this format's journaled Layout/
    //      Manifest jobs. Gate: content invariance (fingerprint through the
    //      whole maintenance chain ≡ DuckDB over the untouched source) plus
    //      exact structural outcomes — the compaction shrank the file
    //      count, the re-cluster wrote exactly n_files, expiry dropped all
    //      but the newest snapshot, vacuum freed every unreferenced
    //      retained file (originals + the compacted intermediates).
    Q("sql_call_maintenance",
      (s, dir) => {
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val stage = java.nio.file.Files.createTempDirectory("graft_sql_call").toString + "/documents"
        val docs = T(s, dir, "documents")
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        docs.filter(col("doc_id") % 2 === 0).repartition(16)
          .write.mode("overwrite").parquet(stage)
        graft.ops.Manifest.create(s, stage, "doc_id")
        docs.filter(col("doc_id") % 2 === 1).repartition(8)
          .write.mode("append").parquet(stage)
        graft.ops.Manifest.createIncremental(s, stage, "doc_id")
        val fs = new org.apache.hadoop.fs.Path(stage)
          .getFileSystem(s.sessionState.newHadoopConf())
        val filesBefore = graft.ops.FsMaint.dataFileCount(fs,
          new org.apache.hadoop.fs.Path(stage))
        val compacted = s.sql(
          s"CALL graft.system.compact('$stage', 64)").head().getLong(0)
        val clustered = s.sql(
          s"CALL graft.system.cluster_range('$stage', 'doc_id', 4)").head().getLong(0)
        val expired = s.sql(
          s"CALL graft.system.expire_snapshots('$stage', 1)").head().getLong(0)
        val vacuumed = s.sql(
          s"CALL graft.system.vacuum('$stage')").head().getLong(0)
        val filesAfter = graft.ops.FsMaint.dataFileCount(fs,
          new org.apache.hadoop.fs.Path(stage))
        graft.functions.Hashing.multisetFingerprintAgg(
            s.sql(s"SELECT * FROM graft.`$stage`"), docCols)
          .withColumn("compaction_shrank",
            lit(compacted < filesBefore && filesAfter == clustered))
          .withColumn("files_after", lit(filesAfter.toLong))
          .withColumn("snapshots_expired", lit(expired))
          // every pre-cluster file (the originals + the compaction's
          // output) is unreferenced once only the clustered snapshot
          // remains — vacuum must free exactly those
          .withColumn("vacuum_exact", lit(vacuumed == filesBefore + compacted))
      },
      Some(s"""SELECT *, true AS compaction_shrank, 4::BIGINT AS files_after,
               | 3::BIGINT AS snapshots_expired, true AS vacuum_exact FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"),
                   "documents t")})""".stripMargin)),

    // ---- SQL metadata tables: graft.`/t$history` (one row per retained
    //      snapshot — id, files, rows, commit instant) and graft.`/t$files`
    //      (the latest snapshot's per-file stats as a NATIVE parquet scan,
    //      bloom sketches pruned) — the Iceberg introspection posture in
    //      plain SQL. Fixture: create → append → SQL DELETE (3 snapshots).
    //      Gate vs DuckDB: $files row sums reproduce the live table's count
    //      exactly, the history ledger counts per snapshot match the
    //      replayed statements, commit instants are monotone.
    Q("sql_meta_tables",
      (s, dir) => {
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val stage = java.nio.file.Files.createTempDirectory("graft_sql_meta").toString + "/documents"
        val docs = T(s, dir, "documents")
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        docs.filter(col("doc_id") % 2 === 0)
          .repartitionByRange(4, col("doc_id")).write.parquet(stage)
        graft.ops.Manifest.create(s, stage, "doc_id")
        docs.filter(col("doc_id") % 2 === 1).repartition(2)
          .write.mode("append").parquet(stage)
        graft.ops.Manifest.createIncremental(s, stage, "doc_id")
        s.sql(s"DELETE FROM graft.`$stage` " +
          s"WHERE doc_id BETWEEN ${maxId / 4} AND ${maxId / 2}")
        val h = s.sql(
          s"""SELECT count(*) AS n_snapshots, max(snapshot) AS latest,
             |  sum(CASE WHEN committed_at IS NULL THEN 1 ELSE 0 END) AS null_commits,
             |  max(n_rows) AS peak_rows
             |FROM graft.`$stage$$history`""".stripMargin)
        val f = s.sql(
          s"""SELECT sum(n_rows) AS live_rows, min(min_doc_id) AS lo,
             |  max(max_doc_id) AS hi FROM graft.`$stage$$files`""".stripMargin)
        h.crossJoin(f)
      },
      Some("""WITH b AS (SELECT max(doc_id) // 4 AS lo, max(doc_id) // 2 AS hi,
              |               max(doc_id) AS mx FROM documents)
              |SELECT 3::BIGINT AS n_snapshots, 3 AS latest, 0::BIGINT AS null_commits,
              | (SELECT count(*) FROM documents)::BIGINT AS peak_rows,
              | (SELECT count(*) FROM documents d, b
              |   WHERE d.doc_id NOT BETWEEN b.lo AND b.hi)::BIGINT AS live_rows,
              | 0::BIGINT AS lo, (SELECT mx FROM b)::BIGINT AS hi""".stripMargin))
  )
}
