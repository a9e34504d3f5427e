package graft

import graft.functions.Hashing
import graft.sync._
import org.apache.spark.sql.functions._

/** FileStore across formats: the same sync engine DAG runs against CSV and
  * JSON table directories (the store trait is the only format-aware layer).
  */
class FileStoreSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
    .toDF("id", "name", "v")

  test("CSV store round-trip: list / read / append / deleteKeys") {
    val store = new FileStore(spark, tmpDir("csvstore"), "csv")
    store.overwrite("t", df)
    assert(store.list() == Seq("t"))
    assert(store.read("t").count() == 3)
    store.append("t", Seq((4L, "d", 4.5)).toDF("id", "name", "v"))
    assert(store.read("t").count() == 4)
    store.deleteKeys("t", Seq(Tuple1(2L)).toDF("id"), Seq("id"))
    assert(store.read("t").select("id").as[Long].collect().sorted
      .sameElements(Array(1L, 3L, 4L)))
  }

  test("ORC store round-trip preserves values exactly") {
    val store = new FileStore(spark, tmpDir("orcstore"), "orc")
    store.overwrite("t", df)
    assert(store.read("t").orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    store.deleteKeys("t", Seq(Tuple1(1L)).toDF("id"), Seq("id"))
    assert(store.read("t").count() == 2)
  }

  test("SyncEngine converges a CSV slave to a JSON master") {
    val cols = Seq("id", "name", "v")
    val ms = new FileStore(spark, tmpDir("json_m"), "json")
    val ss = new FileStore(spark, tmpDir("csv_s"), "csv")
    ms.overwrite("t", df)
    ss.overwrite("t", df.filter($"id" =!= 2L)
      .unionByName(Seq((9L, "ghost", 0.0)).toDF("id", "name", "v")))
    val engine = new SyncEngine(ms, ss, SyncConfig(primaryKeys = Map("t" -> Seq("id"))))
    engine.syncTable("t")
    // Inferred types drift across formats (CSV int vs JSON long), which the
    // engine handles as structure-differs → recopy; compare content under
    // canonical types.
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id").cast("long"), col("name"), col("v").cast("double"))
    assert(Hashing.tableFingerprint(canon(ss.read("t")), cols) ==
      Hashing.tableFingerprint(canon(ms.read("t")), cols))
  }
}
