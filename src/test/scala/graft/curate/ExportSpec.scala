package graft.curate

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExportSpec extends SparkSpec {
  import spark.implicits._

  test("writeJsonlShards: one file per shard, manifest matches, reload lossless") {
    val dir = Files.createTempDirectory("export").toString + "/data"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "source")
    val manifest = Export.writeJsonlShards(docs, "doc_id", dir, numShards = 4)
      .as[(Int, Long)].collect().toMap
    assert(manifest.keySet == Set(0, 1, 2, 3))
    assert(manifest.values.sum == docs.count())
    for (shard <- 0 to 3) {
      val files = new java.io.File(s"$dir/__shard=$shard").listFiles()
        .filter(_.getName.endsWith(".json"))
      assert(files.length == 1, s"shard $shard must be exactly one JSONL file")
    }
    val back = spark.read.json(dir)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").as[Long].collect().toSet ==
      docs.select("doc_id").as[Long].collect().toSet)
  }

  test("sparse export: manifest enumerates EVERY shard, zeros included") {
    val dir = Files.createTempDirectory("exportS").toString + "/d"
    val tiny = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val manifest = Export.writeJsonlShards(tiny, "doc_id", dir, numShards = 8)
      .as[(Int, Long)].collect().toMap
    assert(manifest.keySet == (0 until 8).toSet, "manifest must cover all shard ids")
    assert(manifest.values.sum == 3L)
    assert(manifest.values.exists(_ == 0L), "3 rows over 8 shards must leave empty shards")
  }

  test("NULL record ids are rejected, not exported to a default partition") {
    val dir = Files.createTempDirectory("exportN").toString + "/d"
    val df = Seq((Some(1L), "a"), (None, "b")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Export.writeJsonlShards(df, "doc_id", dir, numShards = 2)
    }
    assert(e.getMessage.contains("NULL"))
  }

  test("shard assignment is content-addressed: invariant to input partitioning") {
    val a = Files.createTempDirectory("exportA").toString + "/d"
    val b = Files.createTempDirectory("exportB").toString + "/d"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source")
    Export.writeJsonlShards(docs.repartition(1), "doc_id", a, numShards = 3)
    Export.writeJsonlShards(docs.repartition(13), "doc_id", b, numShards = 3)
    def shardSets(p: String) = (0 until 3).map { s =>
      spark.read.json(s"$p/__shard=$s").select("doc_id").as[Long].collect().toSet
    }
    assert(shardSets(a) == shardSets(b))
  }
}
