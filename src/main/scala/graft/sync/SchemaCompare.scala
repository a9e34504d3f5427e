package graft.sync

import org.apache.spark.sql.types.StructType

/** Structure comparison + DDL-string normalization (reference S4/O2/F5).
  *
  * The reference compares tables structurally by normalizing MySQL
  * `SHOW CREATE TABLE` strings: strip the volatile `AUTO_INCREMENT=<n>`
  * counter (`Synchronizer.php:200-202`) and alphabetize CONSTRAINT lines,
  * which MySQL reorders on create (`TableConnection.php:419-455`).
  * Spark-side, structural equality is `StructType` equality; the string
  * normalizer is kept for JDBC (MySQL) parity.
  */
object SchemaCompare {

  private val AutoInc = """AUTO_INCREMENT=\d+ """.r

  /** Strip the AUTO_INCREMENT counter (reference F5, `Synchronizer.php:200-202`). */
  def stripAutoIncrement(ddl: String): String = AutoInc.replaceAllIn(ddl, "")

  /** Alphabetize `CONSTRAINT ...` lines within a CREATE TABLE body
    * (reference O2, `TableConnection.php:419-455`): MySQL emits constraints
    * in nondeterministic order, so compare order-insensitively.
    */
  def alphabetizeConstraints(ddl: String): String = {
    val lines = ddl.split("\n", -1)
    val idx = lines.zipWithIndex.filter { case (l, _) => l.trim.startsWith("CONSTRAINT") }
    if (idx.isEmpty) return ddl
    // Sort the constraint lines (sans trailing comma) and write them back into
    // their slots, re-adding commas so only the last body line lacks one.
    val stripped = idx.map { case (l, _) => l.replaceAll(",\\s*$", "") }.sorted
    val out = lines.clone()
    idx.map(_._2).sorted.zip(stripped).foreach { case (pos, l) =>
      val needsComma = lines(pos).trim.endsWith(",")
      out(pos) = if (needsComma) l + "," else l
    }
    out.mkString("\n")
  }

  /** Full normalization pipeline applied before string comparison. */
  def normalizeDdl(ddl: String): String =
    alphabetizeConstraints(stripAutoIncrement(ddl)).trim

  /** Structure equality for DataFrame-backed tables: name/type/nullability of
    * every field, order-sensitive (the reference's string compare is also
    * order-sensitive — a NULL/NOT NULL change in MySQL DDL makes the strings
    * differ, so nullability participates here too).
    */
  def sameStructure(a: StructType, b: StructType): Boolean =
    a.fields.map(f => (f.name, f.dataType, f.nullable))
      .sameElements(b.fields.map(f => (f.name, f.dataType, f.nullable)))
}
