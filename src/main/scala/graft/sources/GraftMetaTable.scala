package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A read-only catalog table over a COMPUTED, metadata-sized frame — what
  * the `$history` introspection suffix serves (rows ∝ retained snapshots,
  * a few KB). Materialized once at load time into a [[LocalScan]]; data-
  * sized introspection (`$files`, rows ∝ file count) is served as a native
  * parquet scan over the snapshot stats instead — never through this.
  */
private[sources] final class GraftMetaTable(tableName: String, df: DataFrame)
  extends Table with SupportsRead {

  private val materialized: Array[InternalRow] =
    df.queryExecution.executedPlan.executeCollect()
  private val metaSchema: StructType = df.schema

  override def name(): String = tableName
  override def schema(): StructType = metaSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Collections.singleton(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def rows(): Array[InternalRow] = materialized
        override def readSchema(): StructType = metaSchema
      }
    }
}
