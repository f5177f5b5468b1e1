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
