package graft

import graft.functions.Hashing
import graft.ops.{Layout, Manifest}
import org.apache.spark.sql.functions._

/** Deletion vectors (merge-on-read position deletes): a DV delete rewrites
  * ZERO data files — it commits the carried stats plus a `_dv/` sidecar of
  * (file name, row position) entries — and every engine read surface
  * applies the vector as an anti-join. Time travel and the change feed are
  * exact across DV snapshots; COW rewrites and compaction FOLD vectors;
  * the SQL catalog refuses un-folded snapshots typed (never wrong rows).
  */
class DeletionVectorSpec extends SparkSpec {

  private val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  private def fp(df: org.apache.spark.sql.DataFrame): String =
    Hashing.multisetFingerprintAgg(df.select(docCols.map(col): _*), docCols)
      .head().getString(0)

  private def fixture(tag: String): String = {
    val dir = tmpDir(tag) + "/docs"
    spark.read.parquet(s"$sf001/documents.parquet")
      .repartitionByRange(6, col("doc_id")).write.parquet(dir)
    Manifest.create(spark, dir, "doc_id")
    dir
  }

  private def dataStamps(dir: String): Map[String, Long] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val out = Map.newBuilder[String, Long]
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
    while (it.hasNext) {
      val f = it.next()
      val p = f.getPath.toUri.getPath
      if (f.getPath.getName.startsWith("part-") && !p.contains("_graft"))
        out += p -> f.getModificationTime
    }
    out.result()
  }

  test("deleteRangeDV: zero files rewritten; reads, scans, and counts exact; deletes compose") {
    val dir = fixture("dv_basic")
    val docs = spark.read.parquet(dir)
    val expectDeleted = docs.filter(col("doc_id").between(100L, 199L)).count()
    val before = dataStamps(dir)
    val r = Layout.deleteRangeDV(spark, dir, "doc_id", 100L, 199L)
    assert(r.rowsDeleted == expectDeleted && r.filesRewritten == 0, s"$r")
    assert(dataStamps(dir) == before,
      "a DV delete must touch zero data files (bytes AND mtimes)")
    val latest = Manifest.latestSnapshotId(spark, dir).get
    val expected = spark.read.parquet(dir)
      .filter(!col("doc_id").between(100L, 199L))
    assert(fp(Manifest.readAsOf(spark, dir, latest)) == fp(expected))
    // Manifest-pruned scan applies the vector too.
    val (rows, _, _) = Manifest.scanRange(spark, dir, "doc_id", 150L, 260L)
    assert(fp(rows) == fp(expected.filter(col("doc_id").between(150L, 260L))))
    // Metadata count routes through the scan (cnt_ stats are physical).
    val (n, _, _) = Manifest.countRange(spark, dir, "doc_id", 0L, 1000000L)
    assert(n == expected.count())
    // Deletes COMPOSE: a second range grows the vector; re-deleting an
    // already-deleted range is a no-op (positions never duplicate).
    val r2 = Layout.deleteRangeDV(spark, dir, "doc_id", 0L, 49L)
    assert(r2.rowsDeleted == docs.filter(col("doc_id") < 50L).count())
    assert(Layout.deleteRangeDV(spark, dir, "doc_id", 100L, 199L).rowsDeleted == 0L)
    val latest2 = Manifest.latestSnapshotId(spark, dir).get
    assert(fp(Manifest.readAsOf(spark, dir, latest2)) ==
      fp(spark.read.parquet(dir).filter(
        !col("doc_id").between(100L, 199L) && !(col("doc_id") < 50L))))
    assert(Manifest.isComplete(spark, dir))
  }

  test("time travel and the change feed are exact across DV snapshots") {
    val dir = fixture("dv_history")
    val docs = spark.read.parquet(dir)
    val id1 = Manifest.latestSnapshotId(spark, dir).get
    val fp1 = fp(docs)
    Layout.deleteRangeDV(spark, dir, "doc_id", 100L, 199L) // snapshot 2
    val id2 = Manifest.latestSnapshotId(spark, dir).get
    // Time travel: the pre-delete snapshot still reads everything.
    assert(fp(Manifest.readAsOf(spark, dir, id1)) == fp1)
    // CDF across a DV-only commit: exactly the deleted rows, tagged delete
    // (the file diff is empty — the vector delta carries the feed).
    val feed = Manifest.changesBetween(spark, dir, id1, id2)
    assert(feed.filter(col("change") === "insert").count() == 0L)
    assert(fp(feed.filter(col("change") === "delete").drop("change")) ==
      fp(docs.filter(col("doc_id").between(100L, 199L))))
    // An append after the DV delete: pure-insert feed, composed reads exact.
    docs.filter(col("doc_id") < 5L)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .write.mode("append").parquet(dir)
    Manifest.createIncremental(spark, dir, "doc_id") // snapshot 3
    val id3 = Manifest.latestSnapshotId(spark, dir).get
    val feed23 = Manifest.changesBetween(spark, dir, id2, id3)
    assert(feed23.filter(col("change") === "delete").count() == 0L)
    assert(feed23.count() == 5L)
    assert(Manifest.readAsOf(spark, dir, id3).count() ==
      docs.count() - 100L + 5L)
    // The vector INHERITS across the append commit (file set grew, no fold).
    assert(Manifest.hasDv(spark, dir, id3))
  }

  test("COW merge and compaction fold the vector; the SQL catalog reads through un-folded snapshots") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val dir = fixture("dv_fold")
    val docs = spark.read.parquet(dir)
    Layout.deleteRangeDV(spark, dir, "doc_id", 100L, 199L)
    // The catalog read applies the vector (GraftDvReadRule) — deleted rows
    // never resurrect into SQL results, before any compaction.
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir`").head().getLong(0) ==
      docs.count() - 100L)
    // A COW merge over files carrying DV entries must NOT resurrect the
    // deleted rows into its survivors, and the rewritten files' entries
    // fold (drop) at commit.
    import spark.implicits._
    val res = Layout.mergeKeyed(spark, dir, "doc_id",
      docs.filter(col("doc_id").between(200L, 209L))
        .withColumn("source", lit("upd")))
    assert(res.rowsUpdated == 10L)
    val afterMerge = Manifest.readAsOf(spark, dir,
      Manifest.latestSnapshotId(spark, dir).get)
    assert(afterMerge.filter(col("doc_id").between(100L, 199L)).count() == 0L,
      "COW survivors must not resurrect DV-deleted rows")
    assert(afterMerge.filter(col("source") === "upd").count() == 10L)
    // Compaction folds the whole vector: hasDv drops, catalog serves again,
    // content identical.
    val expected = fp(afterMerge)
    Layout.compactTable(spark, dir, 64L << 20)
    val latest = Manifest.latestSnapshotId(spark, dir).get
    assert(!Manifest.hasDv(spark, dir, latest), "compaction must fold the DV")
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir`")) == expected)
    // Restore across a DV-only delete: the restored snapshot carries the
    // TARGET's row-level state — here, clearing the vector entirely.
    Layout.deleteRangeDV(spark, dir, "doc_id", 300L, 309L)
    val r = Layout.restoreSnapshot(spark, dir, latest)
    assert(!Manifest.hasDv(spark, dir, r.newSnapshotId),
      "restoring to a DV-free target must clear the vector")
    assert(fp(Manifest.readAsOf(spark, dir, r.newSnapshotId)) == expected,
      "restore across a DV-only delete ≡ the target's visible state")
  }

  test("restore revives a DV-bearing target's exact row-level state") {
    val dir = fixture("dv_restore")
    val docs = spark.read.parquet(dir)
    Layout.deleteRangeDV(spark, dir, "doc_id", 100L, 149L)
    val dvSnap = Manifest.latestSnapshotId(spark, dir).get
    val fpDv = fp(Manifest.readAsOf(spark, dir, dvSnap))
    // Move the table forward: a COW delete (folds some entries, moves
    // files) and an append. The append reads the ORIGINAL corpus, not the
    // staged dir — the COW just retired some of the staged dir's files and
    // a stale plan over them would FileNotFound.
    Layout.deleteRange(spark, dir, "doc_id", 120L, 260L): Unit
    spark.read.parquet(s"$sf001/documents.parquet").filter(col("doc_id") < 5L)
      .withColumn("doc_id", col("doc_id") + 900000L)
      .write.mode("append").parquet(dir)
    Manifest.createIncremental(spark, dir, "doc_id"): Unit
    // Restore back to the DV-bearing snapshot: visible state must equal
    // readAsOf(dvSnap) exactly — files revived AND the vector republished.
    val r = Layout.restoreSnapshot(spark, dir, dvSnap)
    assert(r.revived > 0, s"files replaced by the COW delete must revive: $r")
    assert(Manifest.hasDv(spark, dir, r.newSnapshotId),
      "the target's sidecar restores with it")
    assert(fp(Manifest.readAsOf(spark, dir, r.newSnapshotId)) == fpDv)
    assert(spark.read.parquet(dir)
      .filter(col("doc_id").between(100L, 149L)).count() > 0,
      "physical rows are back (delete stays merge-on-read)")
    assert(Manifest.isComplete(spark, dir))
    // And the restored vector keeps composing: fold returns clean parquet.
    assert(Layout.compactDeletes(spark, dir) > 0)
    assert(fp(spark.read.parquet(dir)) == fpDv)
  }

  test("compact_deletes: targeted fold — only DV-bearing files rewrite, catalog serves again") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val dir = fixture("dv_tfold")
    val expectAfter = fp(spark.read.parquet(dir)
      .filter(!col("doc_id").between(100L, 199L)))
    Layout.deleteRangeDV(spark, dir, "doc_id", 100L, 199L)
    val dvNames = Manifest.currentDv(spark, dir).get
      .select("file_name").distinct().collect().map(_.getString(0)).toSet
    val before = dataStamps(dir)
    val folded = spark.sql(s"CALL graft.system.compact_deletes('$dir')")
      .head().getLong(0)
    assert(folded == dvNames.size, s"folded $folded of ${dvNames.size}")
    // Exactly the DV-bearing files moved; clean files untouched bit-for-bit.
    val after = dataStamps(dir)
    val untouchedBefore = before.filter { case (p, _) =>
      !dvNames(new org.apache.hadoop.fs.Path(p).getName) }
    assert(untouchedBefore.toSet.subsetOf(after.toSet),
      "files without DV entries must not be rewritten")
    val latest = Manifest.latestSnapshotId(spark, dir).get
    assert(!Manifest.hasDv(spark, dir, latest), "the fold drops the vector")
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir`")) == expectAfter,
      "the catalog serves the folded table exactly")
    // Idempotent: a second fold is a no-op.
    assert(spark.sql(s"CALL graft.system.compact_deletes('$dir')")
      .head().getLong(0) == 0L)
  }

  test("SQL catalog reads DV-bearing snapshots: exact, time-travel-correct, DML-safe") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val dir = fixture("dv_sql")
    val docs = spark.read.parquet(dir)
    val fpAll = fp(docs)
    val id1 = Manifest.latestSnapshotId(spark, dir).get
    Layout.deleteRangeDV(spark, dir, "doc_id", 100L, 199L)
    val id2 = Manifest.latestSnapshotId(spark, dir).get
    val expected = docs.filter(!col("doc_id").between(100L, 199L))
    // Latest read, filtered read (predicate through the anti-join), and
    // aggregate all apply the vector.
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir`")) == fp(expected))
    assert(spark.sql(
      s"SELECT count(*) FROM graft.`$dir` WHERE doc_id BETWEEN 50 AND 249")
      .head().getLong(0) ==
      expected.filter(col("doc_id").between(50L, 249L)).count())
    // VERSION AS OF: pre-delete snapshot reads everything; the DV snapshot
    // pinned by id reads through its own vector.
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF $id1")) == fpAll)
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF $id2")) ==
      fp(expected))
    // $files still serves (stats are physical — that is its contract).
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir$$files`")
      .head().getLong(0) > 0L)
    // SQL UPDATE computes its delta THROUGH the vector: updating a range
    // that overlaps deleted rows must not resurrect them. (Expected count
    // materializes BEFORE the COW rewrite moves the files it replaces.)
    val nUpd = expected.filter(col("doc_id").between(150L, 259L)).count()
    val u = spark.sql(s"UPDATE graft.`$dir` SET source = 'dvupd' " +
      "WHERE doc_id BETWEEN 150 AND 259").head()
    assert(u.getLong(u.fieldIndex("rows_updated")) == nUpd)
    val after = Manifest.readAsOf(spark, dir,
      Manifest.latestSnapshotId(spark, dir).get)
    assert(after.filter(col("doc_id").between(100L, 199L)).count() == 0L,
      "UPDATE through a DV table must not resurrect deleted rows")
    assert(after.filter(col("source") === "dvupd").count() == nUpd)
    // MERGE INTO on a still-DV-bearing region behaves (the COW rewrite
    // folds entries for the files it replaces; reads stay exact).
    Layout.deleteRangeDV(spark, dir, "doc_id", 300L, 309L)
    spark.read.parquet(dir).filter(col("doc_id").between(305L, 314L))
      .withColumn("source", lit("dvmerge"))
      .createOrReplaceTempView("dv_sql_delta")
    spark.sql(s"""MERGE INTO graft.`$dir` t USING dv_sql_delta s
                 |ON t.doc_id = s.doc_id
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val fin = spark.sql(s"SELECT * FROM graft.`$dir`")
    assert(fin.filter(col("doc_id").between(300L, 309L) &&
      col("source") =!= "dvmerge").count() == 0L)
    // 310-314 are visible → matched updates; 305-309 were DV-deleted →
    // NOT MATCHED inserts. Either way all 10 delta rows land exactly once.
    assert(fin.filter(col("source") === "dvmerge").count() == 10L)
  }

  test("SQL DV read plan contract: V1 scan over the snapshot's files + sidecar, pushdown intact") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val dir = fixture("dv_sqlplan")
    Layout.deleteRangeDV(spark, dir, "doc_id", 100L, 199L)
    val latest = Manifest.latestSnapshotId(spark, dir).get
    val df = spark.sql(
      s"SELECT doc_id, lang FROM graft.`$dir` WHERE doc_id BETWEEN 0 AND 500")
    df.count()
    val scans = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.execution.FileSourceScanExec]
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = p match {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => scans += f
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case other =>
        other.children.foreach(walk); other.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    val dirAbs = new org.apache.hadoop.fs.Path(dir).toUri.getPath
    val (sidecar, data) = scans.toSeq.partition(
      _.relation.location.rootPaths.exists(_.toString.contains("/_graft_manifest/")))
    assert(data.nonEmpty && sidecar.nonEmpty && scans.size == data.size + sidecar.size,
      s"expected data + sidecar scans only, got ${scans.size}")
    assert(sidecar.forall(_.relation.location.rootPaths.forall(p =>
      p.toUri.getPath.contains("/_dvseg/") ||
        p.toUri.getPath.contains(s"snapshot-$latest/_dv"))))
    assert(data.forall(_.relation.location.rootPaths.forall(p =>
      p.toUri.getPath.startsWith(dirAbs))))
    // The WHERE pushes into the V1 parquet scan despite the anti-join.
    assert(data.exists(_.metadata.get("PushedFilters").exists(s =>
      s.contains("GreaterThanOrEqual(doc_id") || s.contains("LessThanOrEqual(doc_id"))),
      s"pushdown lost: ${data.map(_.metadata.get("PushedFilters")).mkString}")
    // Column pruning holds: the read schema stays narrow (requested cols +
    // the join identity, never the whole row).
    assert(data.forall(f => !f.schema.fieldNames.contains("text")),
      s"pruning lost: ${data.map(_.schema.simpleString).mkString}")
    // Zero-listing posture survives the V1 swap: the swapped relation's
    // index is the descriptor index when the snapshot carries n_bytes.
    assert(data.forall(
      _.relation.location.isInstanceOf[graft.sources.GraftDescriptorFileIndex]),
      "the V1 swap must keep the manifest-descriptor file index")
    // The sidecar anti-join BROADCASTS (the sidecar is small by
    // construction) — a shuffled anti-join here would tax every DV read
    // with a full-table exchange.
    val bcastAnti = scala.collection.mutable.ArrayBuffer.empty[String]
    def walkJoins(p: org.apache.spark.sql.execution.SparkPlan): Unit = p match {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        bcastAnti += b.joinType.toString; b.children.foreach(walkJoins)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walkJoins(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walkJoins(q.plan)
      case other =>
        other.children.foreach(walkJoins); other.subqueries.foreach(walkJoins)
    }
    walkJoins(df.queryExecution.executedPlan)
    assert(bcastAnti.exists(_.contains("LeftAnti")),
      s"the DV anti-join must broadcast the sidecar: joins seen = $bcastAnti")
  }

  test("segmented sidecars: a DV statement writes O(statement delta), carries are zero-copy, folds merge, expiry reclaims") {
    val dir = fixture("dv_seg")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val pool = new org.apache.hadoop.fs.Path(s"$dir/_graft_manifest/_dvseg")
    def segNames(id: Int): Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(
        s"$dir/_graft_manifest/snapshot-$id/_dvlist")
      if (!fs.exists(p)) Nil
      else {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).toList
        finally in.close()
      }
    }
    def segBytes(name: String): Long =
      fs.getContentSummary(new org.apache.hadoop.fs.Path(pool, name)).getLength
    // Statement 1: equal-sized range delete → ONE segment.
    Layout.deleteRangeDV(spark, dir, "doc_id", 0L, 99L)
    val id1 = Manifest.latestSnapshotId(spark, dir).get
    val segs1 = segNames(id1)
    assert(segs1.size == 1, s"one statement = one segment: $segs1")
    // Statement 2 (same delta size): the sidecar WRITE is O(statement
    // delta) — ONE new segment of ~the same bytes, the first carried BY
    // REFERENCE — never a rewrite of the accumulated vector (which is now
    // 2x the delta).
    Layout.deleteRangeDV(spark, dir, "doc_id", 100L, 199L)
    val id2 = Manifest.latestSnapshotId(spark, dir).get
    val segs2 = segNames(id2)
    assert(segs2.size == 2 && segs2.startsWith(segs1),
      s"statement 2 must append one segment to the carried list: $segs1 -> $segs2")
    val fresh = segs2.filterNot(segs1.contains).head
    assert(segBytes(fresh) <= 1.5 * segBytes(segs1.head).toDouble,
      s"statement 2's write must be delta-sized: ${segBytes(fresh)}B vs " +
        s"statement 1's ${segBytes(segs1.head)}B")
    // A plain append carries the list VERBATIM — zero DV bytes written.
    val poolBefore = fs.listStatus(pool).map(_.getPath.getName).toSet
    spark.range(990000L, 990010L).selectExpr(
      "id AS doc_id", "'x' AS text", "'en' AS lang", "'s' AS source",
      "CAST(1 AS BIGINT) AS n_chars").createOrReplaceTempView("dv_seg_app")
    Layout.append(spark, dir, spark.table("dv_seg_app"))
    val id3 = Manifest.latestSnapshotId(spark, dir).get
    assert(segNames(id3) == segs2, "an append must carry the list verbatim")
    assert(fs.listStatus(pool).map(_.getPath.getName).toSet == poolBefore,
      "an append must write zero segments")
    // Reads union the segments exactly. (Fingerprint MATERIALIZED here:
    // the fold below moves these files, invalidating lazy plans.)
    val after = Manifest.readAsOf(spark, dir, id3)
    assert(after.filter(col("doc_id").between(0L, 199L)).count() == 0L)
    assert(after.filter(col("doc_id") >= 990000L).count() == 10L)
    val fpAfter = fp(after)
    // Fold: compactDeletes clears the vector (no _dvlist on the new head).
    assert(Layout.compactDeletes(spark, dir) > 0)
    val id4 = Manifest.latestSnapshotId(spark, dir).get
    assert(segNames(id4).isEmpty && !Manifest.hasDv(spark, dir, id4))
    assert(fp(Manifest.readAsOf(spark, dir, id4)) == fpAfter)
    // Retention: expiring the referencing snapshots reclaims pool segments
    // (lease-aged; forced here).
    val savedLease = Manifest.claimLeaseMs
    Manifest.claimLeaseMs = -1L
    try Manifest.expireSnapshots(spark, dir, 1)
    finally Manifest.claimLeaseMs = savedLease
    assert(!fs.exists(pool) || fs.listStatus(pool).isEmpty,
      "expiry must reclaim unreferenced segments")
    assert(fp(spark.read.parquet(dir)) == fpAfter)
  }

  test("segment fold policy: past the threshold a DV statement folds the list into one segment") {
    val dir = fixture("dv_segfold")
    val saved = Manifest.dvSegmentFoldThreshold
    Manifest.dvSegmentFoldThreshold = 3
    try {
      // Three statements build a three-segment list (under the threshold
      // each appends one delta-sized segment — the bytes contract pinned
      // by the segmented-sidecars test above)...
      Layout.deleteRangeDV(spark, dir, "doc_id", 0L, 9L)
      Layout.deleteRangeDV(spark, dir, "doc_id", 10L, 19L)
      Layout.deleteRangeDV(spark, dir, "doc_id", 20L, 29L)
      val id3 = Manifest.latestSnapshotId(spark, dir).get
      assert(Manifest.dvPaths(spark, dir, id3).size == 3)
      // ...the FOURTH folds the union into ONE fresh segment: a high-churn
      // table can never build an unbounded list.
      Layout.deleteRangeDV(spark, dir, "doc_id", 30L, 39L)
      val id4 = Manifest.latestSnapshotId(spark, dir).get
      assert(Manifest.dvPaths(spark, dir, id4).size == 1,
        s"past the threshold the list must fold: ${Manifest.dvPaths(spark, dir, id4)}")
      // The folded vector serves reads exactly.
      val after = Manifest.readAsOf(spark, dir, id4)
      assert(after.filter(col("doc_id") < 40L).count() == 0L)
      assert(after.count() == 500L - 40L)
      // Growth resumes from the folded base.
      Layout.deleteRangeDV(spark, dir, "doc_id", 40L, 49L)
      val id5 = Manifest.latestSnapshotId(spark, dir).get
      assert(Manifest.dvPaths(spark, dir, id5).size == 2)
      assert(Manifest.readAsOf(spark, dir, id5).count() == 500L - 50L)
    } finally Manifest.dvSegmentFoldThreshold = saved
  }

  test("plan contract: a DV read plans only the data files plus the sidecar") {
    val dir = fixture("dv_plan")
    Layout.deleteRangeDV(spark, dir, "doc_id", 100L, 199L)
    val latest = Manifest.latestSnapshotId(spark, dir).get
    val df = Manifest.readAsOf(spark, dir, latest)
    df.count() // execute
    val roots = scala.collection.mutable.Set.empty[String]
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = p match {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.foreach(rp => roots += rp.toUri.getPath)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case other =>
        other.children.foreach(walk); other.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    val dirAbs = new org.apache.hadoop.fs.Path(dir).toUri.getPath
    val (sidecar, data) = roots.toSeq.partition(_.contains("/_graft_manifest/"))
    assert(data.nonEmpty && data.forall(p =>
      p.startsWith(dirAbs) && !p.contains("_graft_manifest")),
      s"data scans must stay on the table's files: $data")
    assert(sidecar.nonEmpty &&
      sidecar.forall(p => p.contains("/_dvseg/") ||
        p.contains(s"snapshot-$latest/_dv")),
      s"the only extra scan is the snapshot's own DV sidecar: $sidecar")
  }
}
