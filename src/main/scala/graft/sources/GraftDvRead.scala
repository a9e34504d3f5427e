package graft.sources

import graft.ops.Manifest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.StructType

/** SQL reads of DELETION-VECTOR-bearing snapshots (merge-on-read deletes,
  * [[graft.ops.Layout.deleteRangeDV]]): the analyzer rule that makes
  * `SELECT … FROM graft.\`/t\`` correct the moment a DV exists, without
  * waiting for `CALL graft.system.compact_deletes`.
  *
  * Why a REWRITE and not the scan itself: a position-delete sidecar is
  * applied by anti-joining (file name, parquet `_metadata.row_index`) —
  * Spark 4's DSv2 `FileTable` scan cannot produce `_metadata` columns
  * (no `SupportsMetadataColumns`), and a DSv2 `Scan` cannot express a
  * join. The V1 parquet `FileFormat` CAN generate `row_index`, so the
  * rule swaps each read-position relation over a DV-carrying graft table
  * for a V1 `HadoopFsRelation` built over the table's OWN file index —
  * the descriptor index when the snapshot carries byte lengths, so the
  * zero-listing plan handoff survives the swap — and places
  * [[Manifest.applyDv]]'s anti-join DIRECTLY above that scan (the
  * `_metadata`-survival rule), aliasing back to the relation's logical
  * names and exprIds so the surrounding plan is untouched.
  *
  * What the rewrite preserves: filter/column pushdown (the anti-join is
  * left-anti, so Catalyst pushes data predicates through its left side
  * into the V1 scan), broadcast of the sidecar (it is small by
  * construction), rename translation, and snapshot pinning (the file
  * index IS the snapshot's file list). The ONLY added work is the sidecar
  * scan + the anti-join.
  *
  * DML statements keep their DSv2 relation: the engine's own rewrite
  * machinery ([[GraftMergeRule]], [[GraftMutableTable.deleteWhere]])
  * reads through the vector on its own paths, and swapping the TARGET
  * relation would break their resolution. Only read positions — including
  * a MERGE's SOURCE side and subqueries — rewrite.
  */
final case class GraftDvReadRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!plan.resolved) plan else rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    // DML targets stay DSv2 (engine paths apply the vector themselves;
    // GraftMergeRule.rewriteUpdate routes its READ through dvPlanFor) —
    // but a SUBQUERY inside their condition is a read like any other.
    case d: DeleteFromTable =>
      d.copy(condition = subqueries(d.condition))
    case u: UpdateTable =>
      // Assignment VALUES can carry scalar subqueries too (SET x =
      // (SELECT ...)) — those are reads like any other. (MERGE clause
      // conditions cannot: the analyzer refuses subqueries there.)
      u.copy(
        assignments = u.assignments.map(a => a.copy(value = subqueries(a.value))),
        condition = u.condition.map(subqueries))
    case m: MergeIntoTable => m.copy(sourceTable = rewrite(m.sourceTable))
    case r: DataSourceV2Relation =>
      GraftDvRead.dvPlanFor(spark, r).getOrElse(r)
    case other =>
      other.mapChildren(rewrite).transformExpressionsUp {
        case se: SubqueryExpression => se.withNewPlan(rewrite(se.plan))
      }
  }

  private def subqueries(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    e.transformUp {
      case se: SubqueryExpression => se.withNewPlan(rewrite(se.plan))
    }
}

object GraftDvRead {

  /** The (physical-named delegate, logical→physical renames) behind a
    * graft relation that carries a deletion vector — None when the table
    * is not graft-served or its snapshot has no vector (the common case:
    * zero cost beyond the type test).
    */
  private def dvTableOf(r: DataSourceV2Relation)
      : Option[(GraftParquetTable, Map[String, String])] = r.table match {
    case t: GraftParquetTable => t.dvPaths.map(_ => (t, Map.empty[String, String]))
    case t: GraftRenamedTable => t.delegate.dvPaths.map(_ => (t.delegate, t.renames))
    case t: GraftMutableTable =>
      t.readDelegate.dvPaths.map(_ => (t.readDelegate, t.renames))
    case _ => None
  }

  /** The DV-applied read plan for `r`, with OUTPUT IDENTICAL to `r.output`
    * (same names, types, exprIds) so it substitutes in place — or None when
    * `r` carries no vector. Public seam: [[GraftMergeRule]]'s UPDATE
    * rewrite reads its target through this too (its delta is computed over
    * the relation, and computing it raw would resurrect deleted rows into
    * the update).
    */
  private[sources] def dvPlanFor(spark: SparkSession,
                                 r: DataSourceV2Relation): Option[LogicalPlan] =
    dvTableOf(r).map { case (tbl, renames) =>
      // The SAME file index the DSv2 scan would have used — descriptor-built
      // (zero listing) when the snapshot carries n_bytes — served through
      // the V1 parquet format, which CAN generate _metadata.row_index.
      val index = tbl.fileIndex
      val partSchema = index.partitionSpec().partitionColumns
      val physSchema = (tbl: org.apache.spark.sql.connector.catalog.Table).schema()
      val dataSchema = StructType(physSchema.fields
        .filterNot(f => partSchema.fieldNames.contains(f.name)).toIndexedSeq)
      val fsRel = HadoopFsRelation(index, partSchema, dataSchema, None,
        new ParquetFileFormat, Map.empty[String, String])(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
      val base = ColumnShim.ofRows(spark, LogicalRelation(fsRel))
      val dv = spark.read.parquet(tbl.dvPaths.get: _*)
      val inv = renames.map(_.swap)
      // Anti-join DIRECTLY above the file scan (`_metadata` survives
      // nothing else), then alias physical → logical names.
      val applied = Manifest.applyDv(base, Some(dv))
        .select(base.columns.toIndexedSeq.map(c =>
          col(c).as(inv.getOrElse(c, c))): _*)
      val plan = applied.queryExecution.analyzed
      val byName = plan.output.map(a => a.name -> a).toMap
      // Re-key onto the relation's exprIds: every reference above the
      // swapped relation keeps resolving without a re-analysis pass.
      Project(r.output.map { o =>
        Alias(byName(o.name), o.name)(exprId = o.exprId)
      }, plan)
    }
}
