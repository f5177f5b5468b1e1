package graft.curate

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Snapshots

/** Pins [[Bm25Versioned]]: every maintenance op publishes a NEW version
  * whose serving equals a from-scratch rebuild over that version's
  * corpus, old versions stay readable (time travel / pinned readers),
  * compaction folds tombstones, and vacuum drops only unreferenced pool
  * batches. */
class Bm25VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def docsAll = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "durian durian banana durian"),
    (4L, "cherry apple banana"),
    (5L, "banana banana"),
    (6L, "cherry durian apple")).toDF("doc_id", "text")

  private def queries = Seq((100L, "apple banana"), (101L, "cherry durian"))
    .toDF("qid", "qtext")

  private def serve(idx: Bm25.IncIndex) =
    Bm25.topKAgainstIncIndex(idx, queries, "qid", "qtext", k = 4)
      .as[(Long, Int, Long, Double)].collect().toSet

  private def rebuild(corpus: org.apache.spark.sql.DataFrame) =
    Bm25.topK(corpus, "doc_id", "text", queries, "qid", "qtext", k = 4)
      .as[(Long, Int, Long, Double)].collect().toSet

  test("init/append/delete version chain; every version serves its rebuild") {
    val root = java.nio.file.Files.createTempDirectory("bm25v").toString
    try {
      val all = docsAll
      val v1 = Bm25Versioned.init(spark, root, all.filter($"doc_id" <= 2), "doc_id", "text")
      val v2 = Bm25Versioned.append(spark, root,
        all.filter($"doc_id" > 2 && $"doc_id" <= 5), "doc_id", "text")
      val v3 = Bm25Versioned.delete(spark, root, Seq(2L, 5L, 99L).toDF("doc_id"), "doc_id")
      assert((v1, v2, v3) == ((1, 2, 3)))
      // committed version: appended then reduced corpus
      assert(serve(Bm25Versioned.load(spark, root)) ==
        rebuild(all.filter($"doc_id".isin(1L, 3L, 4L))))
      // time travel: v1 and v2 still serve THEIR corpora after the delete
      assert(serve(Bm25Versioned.load(spark, root, Some(1))) ==
        rebuild(all.filter($"doc_id" <= 2)))
      assert(serve(Bm25Versioned.load(spark, root, Some(2))) ==
        rebuild(all.filter($"doc_id" <= 5)))
      // idempotent re-delete and all-blank append are version no-ops
      assert(Bm25Versioned.delete(spark, root, Seq(2L).toDF("doc_id"), "doc_id") == 3)
      assert(Bm25Versioned.append(spark, root,
        Seq((7L, "   ")).toDF("doc_id", "text"), "doc_id", "text") == 3)
      // guarded append rejects a re-added id (tombstoned counts as present)
      val e = intercept[IllegalArgumentException] {
        Bm25Versioned.append(spark, root,
          all.filter($"doc_id" === 2L), "doc_id", "text", rejectDuplicateIds = true)
      }
      assert(e.getMessage.contains("re-adds doc id"))
      // a second init over an existing index is refused
      assert(intercept[IllegalArgumentException] {
        Bm25Versioned.init(spark, root, all, "doc_id", "text")
      }.getMessage.contains("already exists"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("compact folds tombstones into one batch; vacuum keeps pinned + referenced") {
    val root = java.nio.file.Files.createTempDirectory("bm25v2").toString
    try {
      val all = docsAll
      Bm25Versioned.init(spark, root, all.filter($"doc_id" <= 2), "doc_id", "text")
      Bm25Versioned.append(spark, root, all.filter($"doc_id" > 2), "doc_id", "text")
      Bm25Versioned.delete(spark, root, Seq(2L).toDF("doc_id"), "doc_id")
      val reduced = rebuild(all.filter($"doc_id" =!= 2L))
      val v4 = Bm25Versioned.compact(spark, root)
      assert(v4 == 4)
      val idx = Bm25Versioned.load(spark, root)
      assert(idx.tombstones.isEmpty)
      assert(serve(idx) == reduced)
      // compacting a compacted index is a version no-op
      assert(Bm25Versioned.compact(spark, root) == 4)
      // pin v1 for a long reader, vacuum to the newest 1 version: v2/v3
      // meta go, v1 (pinned) + v4 (committed) stay; the pool keeps only
      // batches some REMAINING version references (b00001 for v1, the
      // compacted b00004) and drops the append's b00002
      Snapshots.pin(spark, s"$root/meta", 1, "long-reader")
      val (droppedV, droppedB) = Bm25Versioned.vacuum(spark, root, keepLast = 1)
      assert(droppedV.toSet == Set(2, 3), droppedV)
      assert(droppedB.toSet == Set("b00002"), droppedB)
      assert(serve(Bm25Versioned.load(spark, root, Some(1))) ==
        rebuild(all.filter($"doc_id" <= 2)))
      assert(serve(Bm25Versioned.load(spark, root)) == reduced)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
