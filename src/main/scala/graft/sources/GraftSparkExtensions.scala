package graft.sources

import graft.ops.Layout
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL `MERGE INTO` and `UPDATE` for `graft.`-catalog tables — the
  * statement surface of [[Layout.mergeKeyed]]'s manifest-targeted
  * copy-on-write upsert. Spark only executes these against tables
  * implementing full row-level-operation plumbing; this extension instead
  * rewrites the analyzed [[MergeIntoTable]] / [[UpdateTable]] into a
  * command that calls the engine's own COW machinery — keeping its scale
  * contract (a file is rewritten only if some delta key falls inside its
  * [min, max]; pure inserts append; untouched files are never planned)
  * that a generic group-based rewrite would forfeit.
  *
  * Enabled by [[graft.GraftExtensions]] at session build:
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (analyzer
  * rules cannot attach to a live session).
  *
  * Supported shape — the keyed whole-row upsert [[Layout.mergeKeyed]]
  * implements (the reference's REPLACE-style delete-then-insert,
  * Synchronizer.php:496-507):
  * {{{
  * MERGE INTO graft.`/t` t USING src s ON t.k = s.k
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  * Explicit assignments are accepted when they cover every target column
  * and agree between the UPDATE and INSERT branches (whole-row-replace
  * semantics); anything else — action conditions, partial updates,
  * NOT MATCHED BY SOURCE — fails TYPED at analysis, never silently
  * half-merges.
  */
final case class GraftMergeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable if m.childrenResolved =>
      EliminateSubqueryAliases(m.targetTable) match {
        case r: DataSourceV2Relation if r.table.isInstanceOf[GraftMutableTable] =>
          rewrite(m, r, r.table.asInstanceOf[GraftMutableTable])
        case _ => m
      }
    case u @ UpdateTable(table, assignments, condition) if u.childrenResolved &&
        assignments.forall(_.resolved) && condition.forall(_.resolved) =>
      EliminateSubqueryAliases(table) match {
        case r: DataSourceV2Relation if r.table.isInstanceOf[GraftMutableTable] =>
          rewriteUpdate(r, r.table.asInstanceOf[GraftMutableTable],
            assignments, condition)
        case _ => u
      }
    case other => other
  }

  /** SQL `UPDATE t SET ... WHERE ...` as a read-modify-write through the
    * SAME keyed COW upsert: the delta is the matched rows with assignments
    * applied (computed over the snapshot-pinned relation — copy-on-write
    * isolation by construction), then [[Layout.mergeKeyed]] replaces them
    * in place. The merge key must not be assigned (changing a key is a
    * delete+insert, not an update — fail typed, never silently duplicate).
    * The read side is one pushed-filter scan; the write side rewrites only
    * the files whose key range contains an updated key.
    */
  private def rewriteUpdate(r: DataSourceV2Relation, tbl: GraftMutableTable,
                            assignments: Seq[Assignment],
                            condition: Option[Expression]): LogicalPlan = {
    val keys = graft.ops.Manifest.currentKeyCols(spark, tbl.tableRoot)
      .getOrElse(fail(s"UPDATE on ${tbl.tableRoot} needs a manifest snapshot"))
    val keyCol = keys.head
    val assignByName = assignments.map { a =>
      val name = a.key match {
        case ar: AttributeReference => ar.name
        case other => fail(s"assignment target must be a column, got ${other.sql}")
      }
      if (name == keyCol)
        fail(s"UPDATE must not assign the merge key `$keyCol` — a key change " +
          "is a DELETE + INSERT, not an in-place update")
      name -> a.value
    }.toMap
    val exprs = r.output.map { tc =>
      assignByName.get(tc.name) match {
        case None => tc
        case Some(e) =>
          val cast = if (e.dataType == tc.dataType) e
            else Cast(e, tc.dataType, Some(conf.sessionLocalTimeZone))
          Alias(cast, tc.name)()
      }
    }
    val matched = condition.fold(r: LogicalPlan)(c => Filter(c, r))
    GraftMergeIntoCommand(tbl.tableRoot, keyCol, Project(exprs, matched),
      refuseNullKeys = true)
  }

  private def fail(why: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_0035",
      messageParameters = Map("message" ->
        (s"graft MERGE: $why — supported shape is ON t.key = s.key " +
          "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
          "(whole-row keyed upsert; explicit assignments must cover every " +
          "column and agree between the two branches)")))

  /** The merge key: ON must be one equality between a target attribute and
    * a source attribute (the key identity [[Layout.mergeKeyed]] replaces
    * rows on).
    */
  private def keyOf(m: MergeIntoTable, r: DataSourceV2Relation): String =
    m.mergeCondition match {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if r.outputSet.contains(a) && m.sourceTable.outputSet.contains(b) =>
        a.name
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if r.outputSet.contains(b) && m.sourceTable.outputSet.contains(a) =>
        b.name
      case other => fail(s"ON condition must be a single target-key = " +
        s"source-key equality, got ${other.sql}")
    }

  /** Per-target-column replacement expressions (over SOURCE attributes
    * only), recovered from one action's assignments — or None for a
    * still-unexpanded star action (replace = source column of the same
    * name).
    */
  private def replacementsOf(action: MergeAction, targetCols: Seq[Attribute],
                             source: LogicalPlan): Option[Map[String, Expression]] =
    action match {
      case UpdateStarAction(None) => None
      case InsertStarAction(None) => None
      case UpdateAction(None, assigns, _) => Some(byName(assigns, source))
      case InsertAction(None, assigns) => Some(byName(assigns, source))
      case other => fail(s"unsupported action ${other.getClass.getSimpleName}" +
        (if (other.condition.isDefined) " (action conditions are not supported)"
         else ""))
    }

  private def byName(assigns: Seq[Assignment],
                     source: LogicalPlan): Map[String, Expression] =
    assigns.map { a =>
      val name = a.key match {
        case ar: AttributeReference => ar.name
        case other => fail(s"assignment target must be a column, got ${other.sql}")
      }
      if (!a.value.references.subsetOf(source.outputSet))
        fail(s"assignment to `$name` references target columns — only " +
          "whole-row replacement from the source is expressible as a keyed upsert")
      name -> a.value
    }.toMap

  private def rewrite(m: MergeIntoTable, r: DataSourceV2Relation,
                      tbl: GraftMutableTable): LogicalPlan = {
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported")
    val matched = m.matchedActions match {
      case Seq(one) => one
      case other => fail(s"need exactly one WHEN MATCHED action, got ${other.length}")
    }
    val notMatched = m.notMatchedActions match {
      case Seq(one) => one
      case other => fail(s"need exactly one WHEN NOT MATCHED action, got ${other.length}")
    }
    val keyCol = keyOf(m, r)
    val targetCols = r.output
    val upd = replacementsOf(matched, targetCols, m.sourceTable)
    val ins = replacementsOf(notMatched, targetCols, m.sourceTable)
    val sourceByName = m.sourceTable.output.map(a => a.name -> a).toMap
    // The delta row each target column receives — identical in both
    // branches (update replaces the row, insert creates it: one shape).
    val exprs = targetCols.map { tc =>
      def pick(repl: Option[Map[String, Expression]]): Expression =
        repl match {
          case None => sourceByName.getOrElse(tc.name,
            fail(s"source has no column `${tc.name}` for SET * / INSERT *"))
          case Some(map) => map.getOrElse(tc.name,
            fail(s"assignments must cover every target column (missing `${tc.name}`)"))
        }
      val u = pick(upd)
      val i = pick(ins)
      if (!u.semanticEquals(i))
        fail(s"UPDATE and INSERT disagree on `${tc.name}` (${u.sql} vs " +
          s"${i.sql}) — a keyed upsert replaces whole rows identically")
      val cast = if (u.dataType == tc.dataType) u
        else Cast(u, tc.dataType, Some(conf.sessionLocalTimeZone))
      Alias(cast, tc.name)()
    }
    GraftMergeIntoCommand(tbl.tableRoot, keyCol, Project(exprs, m.sourceTable))
  }
}

/** The executed half of the MERGE rewrite: materializes the source query as
  * the delta frame and hands it to [[Layout.mergeKeyed]] (journaled COW
  * commit, manifest-targeted file picking, history retention — identical to
  * the Scala API call). Returns the merge outcome as the statement result.
  */
final case class GraftMergeIntoCommand(path: String, keyCol: String,
                                       query: LogicalPlan,
                                       refuseNullKeys: Boolean = false)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[QueryPlan[_]] = Seq(query)

  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_rewritten", IntegerType, nullable = false)(),
    AttributeReference("files_total", IntegerType, nullable = false)(),
    AttributeReference("rows_updated", LongType, nullable = false)(),
    AttributeReference("rows_inserted", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val delta = ColumnShim.ofRows(session, query)
    // refuseNullKeys (UPDATE only): a matched NULL-key row cannot be
    // replaced by the keyed upsert — mergeKeyed verifies it inside its
    // fused delta aggregation (no extra job). MERGE keeps NULL-key source
    // rows: legitimate "not matched" inserts under SQL MERGE semantics.
    val res = Layout.mergeKeyed(session, path, keyCol, delta, refuseNullKeys)
    Seq(Row(res.filesRewritten, res.filesTotal, res.rowsUpdated, res.rowsInserted))
  }
}
