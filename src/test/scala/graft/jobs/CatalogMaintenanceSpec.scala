package graft.jobs

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CatalogMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("backup nests frames with tableName tag; restore round-trips") {
    val t1 = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val t2 = Seq((10L, 1.5)).toDF("k", "x")
    val dest = java.nio.file.Files.createTempDirectory("backup").toString + "/b"
    CatalogMaintenance.writeBackup(Map("t1" -> t1, "t2" -> t2), dest)
    val back = CatalogMaintenance.readBackup(spark, dest)
    assert(back.keySet == Set("t1", "t2"))
    assert(back("t1").select("id", "v").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"))) // json round-trip widens ints to long
    assert(back("t2").select("k", "x").as[(Long, Double)].collect().toSeq == Seq((10L, 1.5)))
  }

  test("crawlerUndo restores argmax(updateTime <= t) and flags new tables") {
    val versions = Seq(
      // (name, updateTime, schemaVersion, updatedByCrawler)
      ("orders", 100L, 1, "c1"),
      ("orders", 200L, 2, "c1"),   // latest before t=250
      ("orders", 300L, 3, "c1"),   // after t -> must not be restored
      ("cust", 150L, 1, "c1"),
      ("fresh", 260L, 1, "c1"),    // created after t -> "new"
      ("other", 90L, 1, "c2"))     // different crawler -> ignored
      .toDF("name", "updateTime", "schemaVersion", "updatedByCrawler")
    val (restore, newTables) = CatalogMaintenance.crawlerUndo(versions, "c1", 250L)
    val restored = restore.as[(String, Long, Int)].collect().toSet
    assert(restored == Set(("orders", 200L, 2), ("cust", 150L, 1)))
    assert(newTables.as[String].collect().toSeq == Seq("fresh"))
  }
}
