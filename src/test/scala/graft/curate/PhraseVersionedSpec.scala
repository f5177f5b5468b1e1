package graft.curate

import graft.SparkSpec
import graft.sources.VersionedPool
import org.apache.spark.sql.functions._

class PhraseVersionedSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("phrasev_").toString + "/idx"

  private val docsA = Seq(
    (1L, "fast table scan"), (2L, "the fast table"), (3L, "no hits here")
  ).toDF("doc_id", "text")
  private val docsB = Seq(
    (4L, "fast table fast table"), (5L, "another fast table doc")
  ).toDF("doc_id", "text")
  private val phrase = Seq(Seq("fast", "table"))

  private def hitMap(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_occurrences").as[(Long, Long)].collect().toMap

  test("append version serves exactly a fresh build on the union corpus") {
    val root = freshRoot()
    PhraseVersioned.init(spark, root, docsA, "doc_id", "text")
    val v2 = PhraseVersioned.append(spark, root, docsB, "doc_id", "text")
    assert(v2 == 2)
    val fresh = hitMap(Phrase.phraseSearch(docsA.unionByName(docsB),
      "doc_id", "text", phrase))
    assert(hitMap(PhraseVersioned.hits(spark, root, phrase)) == fresh)
    assert(fresh == Map(1L -> 1L, 2L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("delete publishes metadata only; time travel serves the old version") {
    val root = freshRoot()
    PhraseVersioned.init(spark, root, docsA, "doc_id", "text")
    PhraseVersioned.append(spark, root, docsB, "doc_id", "text")
    val before = VersionedPool.manifestOf(spark, root)
    val v3 = PhraseVersioned.delete(spark, root,
      Seq(4L, 99L).toDF("doc_id"), "doc_id") // 99 absent -> no-op id
    assert(v3 == 3)
    assert(VersionedPool.manifestOf(spark, root) == before,
      "delete must not write pool batches")
    assert(hitMap(PhraseVersioned.hits(spark, root, phrase)) ==
      Map(1L -> 1L, 2L -> 1L, 5L -> 1L))
    // time travel: v2 still sees doc 4
    assert(hitMap(PhraseVersioned.hits(spark, root, phrase, Some(2)))
      .contains(4L))
    // deleting only-absent ids is a version no-op
    assert(PhraseVersioned.delete(spark, root,
      Seq(99L).toDF("doc_id"), "doc_id") == 3)
  }

  test("compact folds tombstones into one batch; vacuum drops unreferenced pool") {
    val root = freshRoot()
    PhraseVersioned.init(spark, root, docsA, "doc_id", "text")
    PhraseVersioned.append(spark, root, docsB, "doc_id", "text")
    PhraseVersioned.delete(spark, root, Seq(4L).toDF("doc_id"), "doc_id")
    val served = hitMap(PhraseVersioned.hits(spark, root, phrase))
    val v4 = PhraseVersioned.compact(spark, root)
    assert(v4 == 4)
    assert(VersionedPool.manifestOf(spark, root).size == 1)
    assert(hitMap(PhraseVersioned.hits(spark, root, phrase)) == served,
      "compact must not change serving")
    val (droppedV, droppedB) = PhraseVersioned.vacuum(spark, root, keepLast = 1)
    assert(droppedV.nonEmpty && droppedB.size == 2,
      s"expected the two pre-compact batches dropped, got $droppedB")
    assert(hitMap(PhraseVersioned.hits(spark, root, phrase)) == served)
  }
}
