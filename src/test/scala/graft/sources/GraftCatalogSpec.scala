package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cat = new GraftCatalog(spark)

  test("save/read/list/drop through the catalog") {
    cat.saveTable("graft_db", "t1", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    assert(cat.tableExists("graft_db", "t1"))
    assert(cat.table("graft_db", "t1").count() == 2)
    assert(cat.table("graft_db", "t1", pushDownPredicate = Some("id = 1")).count() == 1)
    assert(cat.listTables("graft_db").contains("t1"))
    assert(cat.schemaOf("graft_db", "t1").fieldNames.toSeq == Seq("id", "v"))
    cat.dropTable("graft_db", "t1")
    assert(!cat.tableExists("graft_db", "t1"))
  }

  test("crawl registers an existing parquet path as a table") {
    val dir = java.nio.file.Files.createTempDirectory("crawl").toString
    Seq((10L, 1.5)).toDF("k", "x").write.parquet(s"$dir/tbl")
    cat.crawl("graft_db", "crawled", s"$dir/tbl")
    assert(cat.table("graft_db", "crawled").as[(Long, Double)].collect().toSeq == Seq((10L, 1.5)))
    cat.dropTable("graft_db", "crawled")
  }
}
