package graft.sync

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.sql.{Connection, DriverManager}
import java.util.Properties

/** Per-table JDBC read partitioning (the scale knob: replaces the
  * reference's LIMIT/OFFSET paging, `TableConnection.php:241-256`, which
  * re-scans server-side per page — Spark issues `numPartitions` parallel
  * range predicates instead).
  */
final case class JdbcReadSpec(partitionColumn: String, lowerBound: Long,
                              upperBound: Long, numPartitions: Int)

/** JDBC-backed [[TableStore]] (reference parity surface: the original is a
  * MySQL→MySQL syncer, `DatabaseConnection.php` / `TableConnection.php`).
  *
  *  - catalog / PK discovery via `DatabaseMetaData` (S1/S3)
  *  - reads via `spark.read.jdbc`, optionally range-partitioned (S5/S6)
  *  - bulk insert via the JDBC writer with `batchsize` (S9 — the multi-row
  *    VALUES chunking of `TableConnection.php:289-360`)
  *  - keyed deletes via `foreachPartition` + `PreparedStatement` batches
  *    (S10 — no DataFrame-native JDBC delete exists; this is the documented
  *    custom sink, SURVEY §7.4), executed on the EXECUTORS, parallel per
  *    partition, never collected to the driver
  *  - `sessionInit` statements per connection (C10 — the reference's
  *    `SET FOREIGN_KEY_CHECKS=0` / `group_concat_max_len`,
  *    `SynchronizerFactory.php:16-19`)
  */
final class JdbcStore(val spark: SparkSession, url: String,
                      user: Option[(String, String)] = None,
                      readSpecs: Map[String, JdbcReadSpec] = Map.empty,
                      batchSize: Int = 5000,
                      quoteChar: String = "\"",
                      sessionInit: Seq[String] = Nil,
                      /** Enable [[pushedHashMap]] (server-side row hashing —
                        * only hashes cross the wire). MySQL builds its own
                        * expression; other dialects need `hashExprBuilder`. */
                      hashPushdown: Boolean = false,
                      /** Dialect hash-expression builder
                        * `(dataCols, legacyNullSkip) => SQL` for non-MySQL
                        * engines (e.g. [[DerbyDialect.rowHashExpr]]). */
                      hashExprBuilder: Option[(Seq[String], Boolean) => String] = None)
    extends TableStore {

  private def props: Properties = {
    val p = new Properties()
    user.foreach { case (u, pw) => p.setProperty("user", u); p.setProperty("password", pw) }
    p
  }

  private def q(ident: String): String = quoteChar + ident + quoteChar

  /** JDBC subprotocol ("mysql", "derby", …) — gates whether two stores can
    * compare server-rendered DDL directly or must both synthesize.
    */
  private[sync] def dialect: String = url.split(":").lift(1).getOrElse("")

  private def withConnection[T](f: Connection => T): T = {
    val c = user match {
      case Some((u, pw)) => DriverManager.getConnection(url, u, pw)
      case None => DriverManager.getConnection(url)
    }
    try {
      val st = c.createStatement()
      try sessionInit.foreach(st.execute) finally st.close()
      f(c)
    } finally c.close()
  }

  /** S1: catalog scan via metadata (reference SHOW TABLES,
    * `DatabaseConnection.php:48-64`). All metadata lookups pass the
    * connection's (catalog, schema) pair: drivers with catalog-based
    * namespaces (MySQL Connector/J) return null from `getSchema`, and a
    * (null, null) pattern would match same-named tables in OTHER databases,
    * corrupting synthesized DDL and replay statements.
    */
  override def list(): Seq[String] = withConnection { c =>
    val rs = c.getMetaData.getTables(c.getCatalog, c.getSchema, "%", Array("TABLE"))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (rs.next()) out += rs.getString("TABLE_NAME")
    out.sorted.toSeq
  }

  /** S3: primary-key columns in ordinal order (reference SHOW INDEX +
    * `Key_name = "PRIMARY"` filter, `TableConnection.php:635-656`).
    */
  def primaryKeyOf(table: String): Seq[String] = withConnection { c =>
    val rs = c.getMetaData.getPrimaryKeys(c.getCatalog, c.getSchema, table)
    val cols = scala.collection.mutable.ArrayBuffer.empty[(Short, String)]
    while (rs.next()) cols += ((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME")))
    cols.sortBy(_._1).map(_._2).toSeq
  }

  override def read(table: String): DataFrame = {
    val base = spark.read
      .option("fetchsize", batchSize.toString)
    readSpecs.get(table) match {
      case Some(s) => base
        .option("partitionColumn", s.partitionColumn)
        .option("lowerBound", s.lowerBound.toString)
        .option("upperBound", s.upperBound.toString)
        .option("numPartitions", s.numPartitions.toString)
        .jdbc(url, q(table), props)
      case None => base.jdbc(url, q(table), props)
    }
  }

  /** §4 optional fast path — compute pushdown: evaluate the row hash INSIDE
    * the source database so only (key, hash) crosses the wire, the
    * reference's single biggest transfer optimization (MD5/CONCAT_WS run on
    * the MySQL server and 32-byte hashes stream back,
    * `TableConnection.php:46-51`). At 100 TB this turns the diff's scan
    * traffic from full rows into ~40 bytes/row.
    *
    * `hashExpr` is the dialect's hash expression over the data columns;
    * defaults to MySQL's `MD5(CONCAT_WS('#', COALESCE(CAST(c AS CHAR),
    * 'NULL') ...))`, which mirrors [[graft.functions.Hashing.rowHash]].
    * CAVEAT: value→string casts differ between engines — diff two hash maps
    * only when BOTH sides were produced the same way (both pushed down, or
    * both hashed Spark-side), never mixed.
    */
  def readHashMap(table: String, keyCols: Seq[String], dataCols: Seq[String],
                  hashExpr: Option[String] = None): DataFrame = {
    val expr = hashExpr.getOrElse(JdbcStore.mysqlRowHashExpr(dataCols, quoteChar))
    val sql = s"SELECT ${keyCols.map(q).mkString(", ")}, $expr AS ${q("row_hash")} FROM ${q(table)}"
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("query", sql)
      .option("fetchsize", batchSize.toString)
    user.foreach { case (u, pw) => r.option("user", u).option("password", pw) }
    r.load()
  }

  /** [[TableStore.pushedHashMap]] via [[readHashMap]] — the cascade's
    * wire-efficient hash-map step ([[SyncConfig.hashPushdown]]). MySQL uses
    * the reference's own expression shape ([[JdbcStore.mysqlRowHashExpr]]);
    * any other dialect must supply `hashExprBuilder` (the adapter owns cast
    * fidelity for its engine).
    */
  override def pushedHashMap(table: String, projCols: Seq[String], dataCols: Seq[String],
                             legacyNullSkip: Boolean = false): Option[DataFrame] =
    if (!hashPushdown) None
    else {
      val builder = hashExprBuilder.getOrElse {
        require(dialect == "mysql",
          s"hash pushdown on dialect '$dialect' needs an explicit hashExprBuilder " +
            "(only MySQL has a built-in expression)")
        (cols: Seq[String], legacy: Boolean) => JdbcStore.mysqlRowHashExpr(cols, quoteChar, legacy)
      }
      Some(readHashMap(table, projCols, dataCols, Some(builder(dataCols, legacyNullSkip))))
    }

  /** S7 keyed batch lookup, pushed to the database: fetch exactly the rows
    * whose key tuple appears in `keyTuples`, as chunked
    * `SELECT * … WHERE <keys match>` queries (the reference's
    * `WHERE pk IN (chunk)` fetch, `TableConnection.php:241-287`, chunked at
    * CHUNK_SIZE) — the J3 insert fetch's wire-efficient form: a small delta
    * transfers delta-sized rows instead of a full-table scan for a
    * Spark-side semi-join. Single-column keys render as `IN (…)`;
    * composite keys as OR-of-ANDs (portable — Derby has no row-value IN).
    * Returns None when any key component is NULL or not a renderable
    * literal type (caller falls back to the semi-join; PKs are non-null by
    * definition, so None is the exotic path).
    */
  def readKeyed(table: String, keyCols: Seq[String],
                keyTuples: Seq[Seq[Any]], chunkSize: Int = 5000): Option[DataFrame] = {
    def lit(v: Any): Option[String] = v match {
      case null => None
      case _: Long | _: Int | _: Short | _: Byte | _: Boolean => Some(v.toString)
      case d: java.math.BigDecimal => Some(d.toPlainString)
      case d: BigDecimal => Some(d.bigDecimal.toPlainString)
      case s: String => Some("'" + s.replace("'", "''") + "'")
      case d: java.sql.Date => Some("'" + d.toString + "'")
      case t: java.sql.Timestamp => Some("'" + t.toString + "'")
      case _ => None // doubles/bytes/etc: text round-trip is not exact — fall back
    }
    if (keyTuples.isEmpty)
      return Some(read(table).limit(0))
    val rendered = keyTuples.map(t => t.map(lit))
    if (rendered.exists(_.exists(_.isEmpty))) return None
    val lits = rendered.map(_.map(_.get))
    val frames = lits.grouped(chunkSize).map { chunk =>
      val pred =
        if (keyCols.length == 1)
          s"${q(keyCols.head)} IN (${chunk.map(_.head).mkString(", ")})"
        else chunk.map(_.zip(keyCols)
            .map { case (v, k) => s"${q(k)} = $v" }.mkString("(", " AND ", ")"))
          .mkString(" OR ")
      val r = spark.read.format("jdbc")
        .option("url", url)
        .option("query", s"SELECT * FROM ${q(table)} WHERE $pred")
        .option("fetchsize", batchSize.toString)
      user.foreach { case (u, pw) => r.option("user", u).option("password", pw) }
      r.load()
    }.toSeq
    Some(frames.reduce(_ unionByName _))
  }

  override def drop(table: String): Unit = withConnection { c =>
    val st = c.createStatement()
    try st.executeUpdate(s"DROP TABLE ${q(table)}") finally st.close()
  }

  // ---- S4/S13: DDL fetch + replay ------------------------------------------
  //
  // The reference compares normalized `SHOW CREATE TABLE` strings to decide
  // a full recopy (`TableConnection.php:402-410`, `Synchronizer.php:196-204`)
  // and replays the master's DDL on the slave (`Synchronizer.php:330-341`)
  // so indexes/engine/charset survive. Spark's JDBC writer would instead
  // create a bare table from inferred types — silently dropping every
  // secondary index on recopy, and a `StructType` compare cannot even see an
  // index-only change.

  private case class ColMeta(name: String, typeName: String, size: Int,
                             digits: Int, nullable: Boolean, autoInc: Boolean)

  private def columnsOf(c: Connection, table: String): Seq[ColMeta] = {
    val rs = c.getMetaData.getColumns(c.getCatalog, c.getSchema, table, "%")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, ColMeta)]
    while (rs.next()) out += ((rs.getInt("ORDINAL_POSITION"), ColMeta(
      rs.getString("COLUMN_NAME"), rs.getString("TYPE_NAME"),
      rs.getInt("COLUMN_SIZE"), rs.getInt("DECIMAL_DIGITS"),
      rs.getString("IS_NULLABLE") != "NO",
      rs.getString("IS_AUTOINCREMENT") == "YES")))
    out.sortBy(_._1).map(_._2).toSeq
  }

  /** Secondary indexes (name, unique, columns in ordinal order), excluding
    * the primary key's backing index.
    */
  private def indexesOf(c: Connection, table: String,
                        pk: Seq[String]): Seq[(String, Boolean, Seq[String])] = {
    val rs = c.getMetaData.getIndexInfo(c.getCatalog, c.getSchema, table, false, false)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean, Short, String)]
    while (rs.next()) {
      val name = rs.getString("INDEX_NAME")
      val colName = rs.getString("COLUMN_NAME")
      if (name != null && colName != null)
        rows += ((name, !rs.getBoolean("NON_UNIQUE"), rs.getShort("ORDINAL_POSITION"), colName))
    }
    rows.groupBy(_._1).toSeq.map { case (name, rs0) =>
      (name, rs0.head._2, rs0.sortBy(_._3).map(_._4).toSeq)
    }.filterNot { case (name, unique, cols) =>
      // MySQL names it PRIMARY; other engines generate a unique backing
      // index over exactly the PK columns.
      name == "PRIMARY" || (unique && cols == pk)
    }.sortBy(_._1)
  }

  private def typeSql(m: ColMeta): String = m.typeName.toUpperCase match {
    case t @ ("VARCHAR" | "CHAR" | "CHARACTER" | "VARBINARY" | "BINARY") => s"$t(${m.size})"
    case t @ ("DECIMAL" | "NUMERIC") => s"$t(${m.size},${m.digits})"
    case t => t
  }

  /** The table's CREATE DDL for structural comparison. MySQL: the server's
    * own `SHOW CREATE TABLE` (byte-exact reference parity). Elsewhere — or
    * when `forceSynthesized` (a mixed-dialect pair must synthesize BOTH
    * sides; server output vs a synthesis never normalizes equal): a
    * canonical synthesis from JDBC metadata — columns in ordinal order, PK,
    * and secondary indexes as `CONSTRAINT` lines, so
    * [[SchemaCompare.normalizeDdl]] applies to both forms. Two tables built
    * the same way compare equal; an index-only divergence (invisible to
    * `StructType`) does not.
    */
  def fetchCreateTable(table: String, forceSynthesized: Boolean = false): String =
    withConnection { c =>
    if (!forceSynthesized && url.startsWith("jdbc:mysql:")) {
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(s"SHOW CREATE TABLE ${q(table)}")
        rs.next()
        rs.getString(2)
      } finally st.close()
    } else {
      val cols = columnsOf(c, table)
      val pk = primaryKeyOfConn(c, table)
      val idx = indexesOf(c, table, pk)
      val colLines = cols.map(m => s"  ${q(m.name)} ${typeSql(m)}" +
        (if (!m.nullable) " NOT NULL" else "") +
        (if (m.autoInc) " AUTO_INCREMENT" else ""))
      val pkLine = if (pk.nonEmpty) Seq(s"  PRIMARY KEY (${pk.map(q).mkString(", ")})") else Nil
      val idxLines = idx.map { case (n, uniq, cs) =>
        s"  CONSTRAINT ${q(n)} ${if (uniq) "UNIQUE " else ""}KEY (${cs.map(q).mkString(", ")})"
      }
      (Seq(s"CREATE TABLE ${q(table)} (") :+
        (colLines ++ pkLine ++ idxLines).mkString(",\n") :+ ")").mkString("\n")
    }
  }

  private def primaryKeyOfConn(c: Connection, table: String): Seq[String] = {
    val rs = c.getMetaData.getPrimaryKeys(c.getCatalog, c.getSchema, table)
    val cols = scala.collection.mutable.ArrayBuffer.empty[(Short, String)]
    while (rs.next()) cols += ((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME")))
    cols.sortBy(_._1).map(_._2).toSeq
  }

  /** Executable DDL reconstructing this table's structure — CREATE TABLE
    * (columns + PK) followed by one CREATE INDEX per secondary index — in
    * portable SQL a same-engine slave accepts (the reference replays the
    * master's DDL verbatim, MySQL→MySQL; this is the dialect-neutral form).
    * Identity columns replay as the target dialect's identity clause:
    * dropping the attribute would both lose identity semantics AND leave
    * the replayed table's synthesized DDL (`IS_AUTOINCREMENT = NO`) forever
    * unequal to the master's — every subsequent sync would recopy.
    */
  def ddlStatements(table: String): Seq[String] = withConnection { c =>
    val cols = columnsOf(c, table)
    val pk = primaryKeyOfConn(c, table)
    val idx = indexesOf(c, table, pk)
    val colDefs = cols.map { m =>
      val base = s"${q(m.name)} ${typeSql(m)}"
      val nn = if (!m.nullable) " NOT NULL" else ""
      if (!m.autoInc) base + nn
      else if (dialect == "mysql") base + nn + " AUTO_INCREMENT"
      else base + " GENERATED BY DEFAULT AS IDENTITY" + nn
    }
    val pkClause = if (pk.nonEmpty) Seq(s"PRIMARY KEY (${pk.map(q).mkString(", ")})") else Nil
    val create = s"CREATE TABLE ${q(table)} (" +
      (colDefs ++ pkClause).mkString(", ") + ")"
    create +: idx.map { case (n, uniq, cs) =>
      s"CREATE ${if (uniq) "UNIQUE " else ""}INDEX ${q(n)} ON ${q(table)} (${cs.map(q).mkString(", ")})"
    }
  }

  /** S13: drop + recreate from DDL statements (reference
    * `Synchronizer.php:330-341`) — the structure-preserving half of a full
    * recopy; follow with `append(table, masterData)`.
    */
  def createTableFromDdl(table: String, stmts: Seq[String]): Unit = withConnection { c =>
    val st = c.createStatement()
    try {
      try st.executeUpdate(s"DROP TABLE ${q(table)}")
      catch { case _: java.sql.SQLException => () } // absent table
      stmts.foreach(st.executeUpdate)
    } finally st.close()
  }

  override def overwrite(table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("batchsize", batchSize.toString)
      .jdbc(url, q(table), props)

  override def append(table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append)
      .option("batchsize", batchSize.toString)
      .jdbc(url, q(table), props)

  override def deleteKeys(table: String, keys: DataFrame, keyCols: Seq[String]): Unit = {
    // Executor-side batched DELETE: one connection per partition, batches of
    // `batchSize` (the reference chunks tuple-IN lists at CHUNK_SIZE=5000,
    // `TableConnection.php:367-387`). NULL-safe without dialect-specific
    // `<=>`/`IS NOT DISTINCT FROM`: rows are grouped by their null-mask and
    // each mask gets its own prepared statement — `k = ?` for non-null
    // components, `k IS NULL` for null ones (a plain `k = NULL` predicate is
    // UNKNOWN and would silently never delete, the partition-NULL
    // convergence bug).
    val (u, qc, bs, si, usr) = (url, quoteChar, batchSize, sessionInit, user)
    val n = keyCols.length
    require(n <= 62, s"composite key too wide for null-mask grouping: $n")
    val colsQ = keyCols.map(k => s"$qc$k$qc")
    keys.select(keyCols.head, keyCols.tail: _*).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.nonEmpty) {
          val c = usr match {
            case Some((uu, pw)) => DriverManager.getConnection(u, uu, pw)
            case None => DriverManager.getConnection(u)
          }
          try {
            val st0 = c.createStatement()
            try si.foreach(st0.execute) finally st0.close()
            c.setAutoCommit(false)
            val stmts = scala.collection.mutable.Map.empty[Long, (java.sql.PreparedStatement, Int)]
            def flush(mask: Long): Unit = stmts.get(mask).foreach { case (ps, inBatch) =>
              if (inBatch > 0) { ps.executeBatch(); c.commit() }
              stmts(mask) = (ps, 0)
            }
            it.foreach { row =>
              var mask = 0L
              var i = 0
              while (i < n) { if (row.isNullAt(i)) mask |= (1L << i); i += 1 }
              val (ps, inBatch) = stmts.getOrElseUpdate(mask, {
                val preds = colsQ.zipWithIndex.map { case (k, j) =>
                  if ((mask & (1L << j)) != 0) s"$k IS NULL" else s"$k = ?"
                }
                (c.prepareStatement(
                  s"DELETE FROM $qc$table$qc WHERE ${preds.mkString(" AND ")}"), 0)
              })
              var j = 0
              var p = 1
              while (j < n) {
                if ((mask & (1L << j)) == 0) { ps.setObject(p, row.get(j)); p += 1 }
                j += 1
              }
              ps.addBatch()
              stmts(mask) = (ps, inBatch + 1)
              if (inBatch + 1 >= bs) flush(mask)
            }
            stmts.keys.toSeq.foreach(flush)
            stmts.values.foreach { case (ps, _) => ps.close() }
          } finally c.close()
        }
    }
  }

  override def deleteWhere(table: String, partCol: String, value: Any): Unit =
    withConnection { c =>
      if (value == null) {
        // `col = NULL` is UNKNOWN — the NULL partition needs its own predicate.
        val st = c.createStatement()
        try st.executeUpdate(s"DELETE FROM ${q(table)} WHERE ${q(partCol)} IS NULL")
        finally st.close()
      } else {
        val ps = c.prepareStatement(s"DELETE FROM ${q(table)} WHERE ${q(partCol)} = ?")
        try { ps.setObject(1, value); ps.executeUpdate(); () } finally ps.close()
      }
    }
}

object JdbcStore {
  /** Driver-side ceiling for the keyed insert fetch: above this many keys
    * the delta is table-scale anyway and the shuffled semi-join is the
    * right plan; below it, 100k keys × tens of bytes is a few MB on the
    * driver, chunked into ≤20 pushed queries.
    */
  val KeyedFetchMaxKeys = 100000L

  /** MySQL row-hash pushdown expression — the exact SQL shape the reference
    * generates (`TableConnection.php:46-48`) with the NULL-sentinel fix of
    * its table-level hash (`TableConnection.php:475-477`).
    * `legacyNullSkip = true` drops the COALESCE, which IS the reference's
    * row-hash: MySQL `CONCAT_WS` skips NULL arguments entirely — the
    * NULL-permutation collision its own comment flags
    * (`TableConnection.php:472-474`), reproduced bit-for-bit.
    */
  def mysqlRowHashExpr(dataCols: Seq[String], quoteChar: String = "`",
                       legacyNullSkip: Boolean = false): String = {
    val cols =
      if (legacyNullSkip) dataCols.map(c => s"CAST($quoteChar$c$quoteChar AS CHAR)")
      else dataCols.map(c => s"COALESCE(CAST($quoteChar$c$quoteChar AS CHAR), 'NULL')")
    cols.mkString("MD5(CONCAT_WS('#', ", ", ", "))")
  }
}

/** Hash-pushdown adapter for Apache Derby (the JDBC engine shipped with
  * Spark — what the specs and the `sync_jdbc_pushdown` oracle query run
  * against). Derby has no MD5 builtin, so the adapter registers one backed by
  * a static JVM method ([[DerbyDialect.md5Hex]]) — the same move a real
  * deployment makes for any engine lacking a hash function — and renders the
  * canonical `'#'`-joined string with Derby's own operators:
  *
  *  - values canonicalize via `RTRIM(CAST(c AS CHAR(254)))` (Derby pads CHAR
  *    casts; it has no numeric→VARCHAR cast). Contract: rendered values ≤254
  *    chars and no trailing whitespace of their own — MySQL's `CAST(c AS
  *    CHAR)` has neither limit, which is why the builder is per-dialect.
  *  - legacy NULL-skip reproduces `CONCAT_WS` semantics with
  *    `COALESCE('#' || v, '')` per column and the leading separator stripped.
  */
object DerbyDialect {
  /** Static target for Derby's `CREATE FUNCTION` (lowercase hex, matching
    * MySQL's MD5() and Spark's md5()). */
  def md5Hex(v: String): String =
    if (v == null) null
    else java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** Register `GRAFT_MD5` in the Derby database at `url` (idempotent). */
  def installMd5(url: String): Unit = {
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try st.execute(
        """CREATE FUNCTION GRAFT_MD5(V VARCHAR(32000)) RETURNS VARCHAR(32)
          |PARAMETER STYLE JAVA NO SQL LANGUAGE JAVA
          |EXTERNAL NAME 'graft.sync.DerbyDialect.md5Hex'""".stripMargin)
      catch {
        case e: java.sql.SQLException if e.getSQLState == "X0Y68" => () // exists
      } finally st.close()
    } finally c.close()
  }

  /** `(dataCols, legacyNullSkip) => SQL` for [[JdbcStore]]'s
    * `hashExprBuilder`. */
  def rowHashExpr(dataCols: Seq[String], legacyNullSkip: Boolean): String = {
    def canon(c: String) = s"""RTRIM(CAST("$c" AS CHAR(254)))"""
    if (legacyNullSkip) {
      // CONCAT_WS skip semantics: non-null values contribute '#'+v, NULLs
      // contribute nothing; drop the leading separator afterwards.
      val joined = dataCols.map(c => s"COALESCE('#' || ${canon(c)}, '')").mkString(" || ")
      // all-NULL row ⇒ joined = '' ⇒ md5('') like CONCAT_WS; Derby's SUBSTR
      // raises on position > length+1, so guard the empty case explicitly.
      s"GRAFT_MD5(CASE WHEN ($joined) = '' THEN '' ELSE SUBSTR($joined, 2) END)"
    } else
      s"GRAFT_MD5(${dataCols.map(c => s"COALESCE(${canon(c)}, 'NULL')").mkString(" || '#' || ")})"
  }
}
