package graft.queries

import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator corpus: one oracle-checked query per operator in
  * SURVEY §2 (scans, filters, anti/semi joins, set ops, fingerprint
  * aggregations) plus analytic extension queries (joins, windows, rollup).
  */
object CoreQueries {
  import Registry.{table => T, duckRowHash}

  private val liCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")

  /** The synthetic master/slave divergence used by the diff-operator oracles:
    * slave = master minus every 7th order, with quantity bumped on every 13th
    * order (an update → shows up in both anti-join directions).
    */
  private def slaveView(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .filter(col("l_orderkey") % 7 =!= 0)
      .withColumn("l_quantity",
        when(col("l_orderkey") % 13 === 0, col("l_quantity") + 1.0)
          .otherwise(col("l_quantity")))

  private val slaveSql: String =
    """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
      |  CASE WHEN l_orderkey % 13 = 0 THEN l_quantity + 1.0 ELSE l_quantity END AS l_quantity,
      |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
      |FROM lineitem WHERE l_orderkey % 7 <> 0""".stripMargin

  def all: Seq[Q] = Seq(

    // ---- S1: catalog scan (reference SHOW TABLES, DatabaseConnection.php:48-64)
    Q("s1_catalog",
      (s, dir) => {
        import s.implicits._
        new graft.sync.ParquetStore(s, dir).list().toDF("table_name")
      },
      Some("SELECT * FROM (VALUES ('customer'),('documents'),('embeddings'),('events')," +
        "('lineitem'),('nation'),('orders'),('part'),('region'),('supplier')) AS t(table_name)")),

    // ---- S2: schema scan (reference SHOW COLUMNS, TableConnection.php:663-675)
    Q("s2_schema",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "lineitem").schema.fieldNames.zipWithIndex
          .map { case (n, i) => (i + 1, n) }.toSeq.toDF("ordinal", "col_name")
      },
      Some("SELECT * FROM (VALUES (1,'l_orderkey'),(2,'l_partkey'),(3,'l_suppkey')," +
        "(4,'l_linenumber'),(5,'l_quantity'),(6,'l_extendedprice'),(7,'l_discount')," +
        "(8,'l_tax'),(9,'l_returnflag'),(10,'l_linestatus'),(11,'l_shipdate')) AS t(ordinal, col_name)")),

    // ---- P1 legacy variant: the reference's NULL-skipping row hash
    //      (CONCAT_WS drops NULLs — TableConnection.php:46-48; DuckDB's
    //      concat_ws has the same MySQL semantics, so this oracle pins the
    //      legacy behavior byte-for-byte). Nulls synthesized via nullif.
    Q("p1_hash_legacy",
      (s, dir) => {
        val li = T(s, dir, "lineitem")
          .withColumn("rf", nullif(col("l_returnflag"), lit("R")))
          .withColumn("ls", nullif(col("l_linestatus"), lit("F")))
        Hashing.hashMap(li, Seq("l_orderkey", "l_linenumber"),
          Seq("rf", "ls", "l_quantity"), legacyNullSkip = true)
      },
      Some("""SELECT l_orderkey, l_linenumber,
              | md5(concat_ws('#', nullif(l_returnflag,'R'), nullif(l_linestatus,'F'),
              |   cast(l_quantity as varchar))) AS row_hash
              |FROM lineitem""".stripMargin)),

    // ---- S15: audit-log / dry-run plan (reference logs every write query,
    //      TableConnection.php:730-742; here the plan itself is data)
    Q("s15_audit_dryrun",
      (s, dir) => {
        import s.implicits._
        val slaveDir = SyncQueries.makeSlaveDir(s, dir, "audit")
        val engine = new graft.sync.SyncEngine(
          new graft.sync.ParquetStore(s, dir), new graft.sync.ParquetStore(s, slaveDir),
          graft.sync.SyncConfig(
            primaryKeys = Map("lineitem" -> Seq("l_orderkey", "l_linenumber")),
            dryRun = true))
        engine.syncTable("lineitem")
        engine.auditLog.collect {
          case graft.sync.SyncAction.ApplyDelta(t, d, i) => ("ApplyDelta", t, d, i)
        }.toDF("action", "table_name", "n_deleted", "n_inserted")
      },
      Some("""SELECT 'ApplyDelta' AS action, 'lineitem' AS table_name,
              | (SELECT count(*) FROM lineitem WHERE l_orderkey % 7 <> 0 AND l_orderkey % 13 = 0) + 3 AS n_deleted,
              | (SELECT count(*) FROM lineitem WHERE l_orderkey % 7 = 0 OR l_orderkey % 13 = 0) AS n_inserted""".stripMargin)),

    // ---- S3: primary-key scan (reference SHOW INDEX → PK columns,
    //      TableConnection.php:635-656; parquet-backed stores declare keys in
    //      SyncConfig — surfaced here as ordered (table, ordinal, col) rows)
    Q("s3_pk_scan",
      (s, dir) => {
        import s.implicits._
        val cfg = graft.sync.SyncConfig(primaryKeys = Map(
          "lineitem" -> Seq("l_orderkey", "l_linenumber"),
          "orders" -> Seq("o_orderkey"),
          "customer" -> Seq("c_custkey")))
        cfg.primaryKeys.toSeq.sortBy(_._1).flatMap { case (t, ks) =>
          ks.zipWithIndex.map { case (k, i) => (t, i + 1, k) }
        }.toDF("table_name", "ordinal", "col_name")
      },
      Some("SELECT * FROM (VALUES ('customer',1,'c_custkey'),('lineitem',1,'l_orderkey')," +
        "('lineitem',2,'l_linenumber'),('orders',1,'o_orderkey')) AS t(table_name, ordinal, col_name)")),

    // ---- S4/O2/F5: DDL normalization decides structure equality
    //      (Synchronizer.php:196-204: strip AUTO_INCREMENT counter,
    //      alphabetize CONSTRAINT lines, then string-compare)
    Q("s4_ddl_normalize",
      (s, dir) => {
        import s.implicits._
        def ddl(autoInc: Int, constraintsZFirst: Boolean, extraCol: Boolean): String = {
          val cons = Seq(
            "  CONSTRAINT `fk_z` FOREIGN KEY (`cust`) REFERENCES `customer` (`id`),",
            "  CONSTRAINT `fk_a` FOREIGN KEY (`nat`) REFERENCES `nation` (`id`)")
          val body = Seq(
            "CREATE TABLE `t` (",
            "  `id` int NOT NULL AUTO_INCREMENT,",
            if (extraCol) "  `extra` varchar(16) DEFAULT NULL," else "  `cust` int DEFAULT NULL,",
            "  PRIMARY KEY (`id`),") ++
            (if (constraintsZFirst) cons else Seq(cons(1) + ",", cons(0).dropRight(1))) ++
            Seq(s") ENGINE=InnoDB AUTO_INCREMENT=$autoInc DEFAULT CHARSET=utf8")
          body.mkString("\n")
        }
        val master = ddl(9999, constraintsZFirst = true, extraCol = false)
        Seq(
          ("ai_and_constraint_order",
            graft.sync.SchemaCompare.normalizeDdl(master) ==
              graft.sync.SchemaCompare.normalizeDdl(ddl(7, constraintsZFirst = false, extraCol = false))),
          ("changed_column",
            graft.sync.SchemaCompare.normalizeDdl(master) ==
              graft.sync.SchemaCompare.normalizeDdl(ddl(9999, constraintsZFirst = true, extraCol = true)))
        ).toDF("scenario", "structures_equal")
      },
      Some("SELECT * FROM (VALUES ('ai_and_constraint_order', true)," +
        "('changed_column', false)) AS t(scenario, structures_equal)")),

    // ---- S6: chunked scan — the reference pages LIMIT n OFFSET k with no
    //      ORDER BY (TableConnection.php:241-256); here the page is made
    //      deterministic with an explicit sort (documented improvement)
    Q("s6_chunked_scan",
      (s, dir) => T(s, dir, "orders")
        .orderBy("o_orderkey")
        .offset(100).limit(50)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"),
      Some("SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders " +
        "ORDER BY o_orderkey LIMIT 50 OFFSET 100")),

    // ---- S11: upsert = delete-then-insert by PK (replaceRows,
    //      TableConnection.php:599-627; live path Synchronizer.php:496-507)
    Q("s11_upsert",
      (s, dir) => {
        val updates = T(s, dir, "lineitem")
          .filter(col("l_orderkey") % 97 === 0)
          .withColumn("l_quantity", col("l_quantity") + 5.0)
          .select(liCols.map(col): _*)
        slaveView(s, dir).select(liCols.map(col): _*)
          .join(updates.select("l_orderkey", "l_linenumber"),
            Seq("l_orderkey", "l_linenumber"), "left_anti")
          .select(liCols.map(col): _*)
          .unionByName(updates)
      },
      Some(s"""WITH slave AS ($slaveSql),
               | upd AS (SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
               |   l_quantity + 5.0 AS l_quantity, l_extendedprice, l_discount, l_tax,
               |   l_returnflag, l_linestatus, l_shipdate
               |  FROM lineitem WHERE l_orderkey % 97 = 0)
               |SELECT * FROM slave s
               |WHERE NOT EXISTS (SELECT 1 FROM upd u
               |  WHERE u.l_orderkey = s.l_orderkey AND u.l_linenumber = s.l_linenumber)
               |UNION ALL SELECT * FROM upd""".stripMargin)),

    // ---- E2: except over distinct partition values (Synchronizer.php:147-148
    //      fastDiff — which partitions exist on master but not slave)
    Q("e2_except_partitions",
      (s, dir) => {
        val slaveOrders = T(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
        T(s, dir, "orders").select(col("o_orderpriority").as("part_value")).distinct()
          .except(slaveOrders.select(col("o_orderpriority").as("part_value")).distinct())
      },
      Some("""SELECT DISTINCT o_orderpriority AS part_value FROM orders
              |EXCEPT SELECT DISTINCT o_orderpriority AS part_value FROM orders
              | WHERE o_orderpriority <> '1-URGENT'""".stripMargin)),

    // ---- S5: full scan (reference fetchAllRows, TableConnection.php:218-231)
    Q("s5_full_scan",
      (s, dir) => T(s, dir, "region"),
      Some("SELECT r_regionkey, r_name FROM region")),

    // ---- S7: keyed batch lookup (TableConnection.php:177-209)
    Q("s7_keyed_lookup",
      (s, dir) => T(s, dir, "customer")
        .filter(col("c_custkey").isin(1L, 5L, 9L, 23L, 42L, 77L, 104L, 131L))
        .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
      Some("SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer " +
        "WHERE c_custkey IN (1,5,9,23,42,77,104,131)")),

    // ---- S8/A4: count (TableConnection.php:712-720)
    Q("s8_count",
      (s, dir) => T(s, dir, "lineitem").agg(count(lit(1)).as("cnt")),
      Some("SELECT count(*) AS cnt FROM lineitem")),

    // ---- P1: hash projection — the engine's central IR
    //      (TableConnection.php:46-51), NULL-fixed variant
    Q("p1_hash_projection",
      (s, dir) => {
        val li = T(s, dir, "lineitem")
        Hashing.hashMap(li, Seq("l_orderkey", "l_linenumber"), liCols)
      },
      Some(s"SELECT l_orderkey, l_linenumber, ${duckRowHash(liCols)} AS row_hash FROM lineitem")),

    // ---- P2: partition-value equality filter (TableConnection.php:121)
    Q("p2_eq_filter",
      (s, dir) => T(s, dir, "lineitem").filter(col("l_orderkey") === 42)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      Some("SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice " +
        "FROM lineitem WHERE l_orderkey = 42")),

    // ---- P3: composite-key tuple-IN filter (TableConnection.php:193-194)
    Q("p3_tuple_in",
      (s, dir) => {
        val keys = s.createDataFrame(Seq((1L, 1), (2L, 1), (3L, 2), (5L, 1), (8L, 3)))
          .toDF("l_orderkey", "l_linenumber")
        T(s, dir, "lineitem").join(broadcast(keys), Seq("l_orderkey", "l_linenumber"), "left_semi")
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      },
      Some("SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem " +
        "WHERE (l_orderkey, l_linenumber) IN ((1,1),(2,1),(3,2),(5,1),(8,3))")),

    // ---- P4: regex name filter (Synchronizer.php:300-320)
    Q("p4_regex_filter",
      (s, dir) => T(s, dir, "part")
        .filter(col("p_name").rlike("^(small|large) ") && !col("p_brand").rlike("#1[0-9]$"))
        .select("p_partkey", "p_name", "p_brand"),
      Some("SELECT p_partkey, p_name, p_brand FROM part " +
        "WHERE regexp_matches(p_name, '^(small|large) ') AND NOT regexp_matches(p_brand, '#1[0-9]$')")),

    // ---- J1: anti-join on content hash — missing rows (Synchronizer.php:446-524).
    //      Uses the engine's fast 128-bit raw-value hash (the hash is internal
    //      membership currency — only keys are output, so the md5-canonical
    //      form's string casts would be pure overhead; the oracle's md5 NOT IN
    //      yields the same key set).
    Q("j1_anti_missing",
      (s, dir) => {
        val mh = Hashing.fastHashMap(T(s, dir, "lineitem"), Seq("l_orderkey", "l_linenumber"), liCols)
        val sh = Hashing.fastHashMap(slaveView(s, dir), Seq("l_orderkey", "l_linenumber"), liCols)
        mh.join(sh.select(Hashing.FastHashCols.map(col): _*), Hashing.FastHashCols, "left_anti")
          .select("l_orderkey", "l_linenumber")
      },
      Some(s"""WITH slave AS ($slaveSql),
               | mh AS (SELECT l_orderkey, l_linenumber, ${duckRowHash(liCols)} AS h FROM lineitem),
               | sh AS (SELECT ${duckRowHash(liCols)} AS h FROM slave)
               |SELECT l_orderkey, l_linenumber FROM mh WHERE h NOT IN (SELECT h FROM sh)""".stripMargin)),

    // ---- J2: anti-join on content hash — excess rows (Synchronizer.php:531-583)
    Q("j2_anti_excess",
      (s, dir) => {
        val mh = Hashing.fastHashMap(T(s, dir, "lineitem"), Seq("l_orderkey", "l_linenumber"), liCols)
        val sh = Hashing.fastHashMap(slaveView(s, dir), Seq("l_orderkey", "l_linenumber"), liCols)
        sh.join(mh.select(Hashing.FastHashCols.map(col): _*), Hashing.FastHashCols, "left_anti")
          .select("l_orderkey", "l_linenumber")
      },
      Some(s"""WITH slave AS ($slaveSql),
               | mh AS (SELECT ${duckRowHash(liCols)} AS h FROM lineitem),
               | sh AS (SELECT l_orderkey, l_linenumber, ${duckRowHash(liCols)} AS h FROM slave)
               |SELECT l_orderkey, l_linenumber FROM sh WHERE h NOT IN (SELECT h FROM mh)""".stripMargin)),

    // ---- J3: semi-join keyed fetch of full rows (TableConnection.php:177-209)
    Q("j3_semi_fetch",
      (s, dir) => {
        val m = T(s, dir, "lineitem")
        val mh = Hashing.fastHashMap(m, Seq("l_orderkey", "l_linenumber"), liCols)
        val sh = Hashing.fastHashMap(slaveView(s, dir), Seq("l_orderkey", "l_linenumber"), liCols)
        val missing = mh.join(sh.select(Hashing.FastHashCols.map(col): _*), Hashing.FastHashCols, "left_anti")
          .select("l_orderkey", "l_linenumber")
        // Explicit broadcast: the missing set is a small fraction of the
        // table here, and AQE would launch the full by-key source shuffle
        // before discovering that (the engine path sizes this from the
        // spilled key count — Differ.applyDelta).
        m.join(broadcast(missing), Seq("l_orderkey", "l_linenumber"), "left_semi")
      },
      Some(s"""WITH slave AS ($slaveSql),
               | mh AS (SELECT l_orderkey, l_linenumber, ${duckRowHash(liCols)} AS h FROM lineitem),
               | sh AS (SELECT ${duckRowHash(liCols)} AS h FROM slave),
               | missing AS (SELECT l_orderkey, l_linenumber FROM mh WHERE h NOT IN (SELECT h FROM sh))
               |SELECT l.* FROM lineitem l
               |WHERE EXISTS (SELECT 1 FROM missing m
               |  WHERE m.l_orderkey = l.l_orderkey AND m.l_linenumber = l.l_linenumber)""".stripMargin)),

    // ---- E1: except (Synchronizer.php:47-49 driver set-algebra, as data op)
    Q("e1_except",
      (s, dir) => T(s, dir, "customer").select(col("c_nationkey").as("k"))
        .except(T(s, dir, "supplier").select(col("s_nationkey").as("k"))),
      Some("SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey AS k FROM supplier")),

    // ---- E3: intersect (Synchronizer.php:149)
    Q("e3_intersect",
      (s, dir) => T(s, dir, "customer").select(col("c_nationkey").as("k"))
        .intersect(T(s, dir, "supplier").select(col("s_nationkey").as("k"))),
      Some("SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey AS k FROM supplier")),

    // ---- A1: whole-table fingerprint (TableConnection.php:464-501) on the
    //      DISTRIBUTED multiset aggregate — one map-side-combined pass,
    //      nothing collected; this is the form the sync cascade runs at scale.
    Q("a1_table_fingerprint",
      (s, dir) => Hashing.multisetFingerprintAgg(T(s, dir, "lineitem"), liCols),
      Some(Registry.duckMultisetFingerprint(liCols, "lineitem"))),

    // ---- A1 (secondary): exact order-canonical sorted digest — the
    //      byte-stable cross-engine form. Driver-collects O(table) by
    //      construction, so it is declared on a SMALL table and the utility
    //      itself enforces a row cap (Hashing.ExactFingerprintMaxRows).
    Q("a1_exact_digest",
      (s, dir) => {
        val cols = Seq("n_nationkey", "n_name", "n_regionkey")
        Hashing.exactFingerprint(
          T(s, dir, "nation").select(cols.map(col): _*), cols)
      },
      Some(s"""SELECT md5(string_agg(h, '' ORDER BY h)) AS fingerprint FROM
               | (SELECT ${duckRowHash(Seq("n_nationkey", "n_name", "n_regionkey"))} AS h
               |  FROM nation)""".stripMargin)),

    // ---- A2: per-partition fingerprints, one grouped pass
    //      (TableConnection.php:510-547)
    Q("a2_partition_fingerprints",
      (s, dir) => {
        val li = T(s, dir, "lineitem")
        li.select(col("l_returnflag"), Hashing.rowHash(li, liCols).as("h"))
          .groupBy("l_returnflag")
          .agg(md5(concat_ws("", sort_array(collect_list(col("h"))))).as("fingerprint"),
            count(lit(1)).as("n_rows"))
      },
      Some(s"""SELECT l_returnflag, md5(string_agg(h, '' ORDER BY h)) AS fingerprint,
               | count(*) AS n_rows FROM
               | (SELECT l_returnflag, ${duckRowHash(liCols)} AS h FROM lineitem)
               |GROUP BY l_returnflag""".stripMargin)),

    // ---- A3: distinct partition values (Synchronizer.php:128-145)
    Q("a3_distinct",
      (s, dir) => T(s, dir, "orders").select(col("o_orderpriority").as("part_value")).distinct(),
      Some("SELECT DISTINCT o_orderpriority AS part_value FROM orders")),

    // ---- Q1: TPC-H Q1-style grouped aggregation (extension corpus).
    //      Decimal-exact arithmetic, surfaced as double for cross-engine parity.
    Q("q1_agg",
      (s, dir) => {
        val li = T(s, dir, "lineitem")
        val qty = col("l_quantity").cast("decimal(12,2)")
        val price = col("l_extendedprice").cast("decimal(12,2)")
        val disc = col("l_discount").cast("decimal(12,2)")
        val tax = col("l_tax").cast("decimal(12,2)")
        li.groupBy("l_returnflag", "l_linestatus").agg(
          sum(qty).cast("double").as("sum_qty"),
          sum(price).cast("double").as("sum_base_price"),
          sum(price * (lit(1).cast("decimal(12,2)") - disc)).cast("double").as("sum_disc_price"),
          sum(price * (lit(1).cast("decimal(12,2)") - disc) * (lit(1).cast("decimal(12,2)") + tax))
            .cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
              | cast(sum(cast(l_quantity as decimal(12,2))) as double) AS sum_qty,
              | cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS sum_base_price,
              | cast(sum(cast(l_extendedprice as decimal(12,2)) * (cast(1 as decimal(12,2)) - cast(l_discount as decimal(12,2)))) as double) AS sum_disc_price,
              | cast(sum(cast(l_extendedprice as decimal(12,2)) * (cast(1 as decimal(12,2)) - cast(l_discount as decimal(12,2))) * (cast(1 as decimal(12,2)) + cast(l_tax as decimal(12,2)))) as double) AS sum_charge,
              | count(*) AS count_order
              |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- Q3: 3-way join + grouped revenue + deterministic top-k
    Q("q3_join_topk",
      (s, dir) => {
        val c = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = T(s, dir, "orders")
        val li = T(s, dir, "lineitem")
        val rev = col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey")
          .agg(sum(rev).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey,
              | cast(sum(cast(l_extendedprice as decimal(12,2)) * (cast(1 as decimal(12,2)) - cast(l_discount as decimal(12,2)))) as double) AS revenue
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |WHERE c_mktsegment = 'BUILDING'
              |GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // ---- TPC-H Q6-style selective filter + ungrouped aggregate: the
    //      filters must reach the parquet scan as PushedFilters
    Q("q6_filter_agg",
      (s, dir) => T(s, dir, "lineitem")
        .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          col("l_discount").cast("decimal(12,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n")),
      Some("""SELECT cast(sum(cast(l_extendedprice as decimal(12,2)) * cast(l_discount as decimal(12,2))) as double) AS revenue,
              | count(*) AS n
              |FROM lineitem
              |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // ---- window function: top order per customer (extension corpus)
    Q("q_window_top_order",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        T(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("o_custkey", "o_orderkey", "o_totalprice")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
              | SELECT o_custkey, o_orderkey, o_totalprice,
              |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
              | FROM orders) WHERE rn = 1""".stripMargin)),

    // ---- rollup (grouping-set family, extension corpus)
    Q("q_rollup",
      (s, dir) => T(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
              | cast(sum(cast(l_quantity as decimal(12,2))) as double) AS sum_qty
              |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin)),

    // ---- TPC-H Q5-style 5-table join: dims broadcast, fact joined last;
    //      Catalyst + AQE pick broadcast-hash for every dim side
    Q("q5_multi_join",
      (s, dir) => {
        val region = T(s, dir, "region").filter(col("r_name") === "ASIA")
        val nation = T(s, dir, "nation")
        val cust = T(s, dir, "customer")
        val ord = T(s, dir, "orders")
        val li = T(s, dir, "lineitem")
        val rev = col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      },
      Some("""SELECT n_name,
              | cast(sum(cast(l_extendedprice as decimal(12,2)) * (cast(1 as decimal(12,2)) - cast(l_discount as decimal(12,2)))) as double) AS revenue,
              | count(*) AS n_items
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA' GROUP BY n_name""".stripMargin)),

    // ---- cube (full grouping-set family alongside q_rollup)
    Q("q_cube",
      (s, dir) => T(s, dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("sum_price")),
      Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
              | cast(sum(cast(o_totalprice as decimal(14,2))) as double) AS sum_price
              |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)""".stripMargin)),

    // ---- skew-resistant two-phase aggregation: event_type has only a
    //      handful of giant groups — a plain groupBy funnels each through
    //      one reducer at scale; salting fans each hot key across 32
    //      partial-aggregate buckets first (ops.Skew). Decimal sums keep the
    //      recombination exact for the oracle.
    Q("q_salted_agg",
      (s, dir) => graft.ops.Skew.saltedCountSum(
          Registry.events(s, dir).withColumn("v", col("value").cast("decimal(12,2)")),
          keyCols = Seq("event_type"), sumCols = Seq("v"), saltBuckets = 32)
        .select(col("event_type"), col("n"), col("sum_v").cast("double").as("sum_value")),
      Some("""SELECT event_type, count(*) AS n,
              | cast(sum(cast(value as decimal(12,2))) as double) AS sum_value
              |FROM events GROUP BY event_type""".stripMargin)),

    // ---- time-bucketed aggregation over the events table
    Q("q_events_hourly",
      (s, dir) => Registry.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value")),
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
              | cast(sum(cast(value as decimal(12,2))) as double) AS sum_value
              |FROM events GROUP BY 1, 2""".stripMargin))
  )
}
