package graft.curate

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("learns the hand-computed merges on a tiny corpus") {
    // "low low lower": pairs l-o ×3, o-w ×3, w-e ×1, e-r ×1.
    // Rank 1: tie l-o vs o-w at 3 → lexicographic picks (l,o).
    // Rank 2: (lo,w) ×3. Rank 3: low→[low], lower→[low,e,r] leaves
    // (low,e) and (e,r) tied at 1 → "e" < "low" picks (e,r).
    val df = corpus("low low lower")
    val m = Bpe.learnMerges(df, "text", 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq === Seq((1, "l", "o", 3L), (2, "lo", "w", 3L), (3, "e", "r", 1L)))
  }

  test("lexicographic tie-break on equal counts") {
    val df = corpus("bc", "ad")
    val m = Bpe.learnMerges(df, "text", 1).collect()
    assert((m(0).getString(1), m(0).getString(2)) === ("a", "d"))
  }

  test("greedy left-to-right non-overlapping merge: 'a a a' -> [aa, a]") {
    // after merge 1 = (a,a) cnt 2 (overlapping adjacent positions), the
    // rewritten word is [aa, a], so merge 2 must be (aa, a) cnt 1
    val df = corpus("aaa")
    val m = Bpe.learnMerges(df, "text", 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq === Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))
  }

  test("stops early when no pairs remain") {
    val df = corpus("ab ab")
    val m = Bpe.learnMerges(df, "text", 5).collect()
    assert(m.length === 1) // (a,b); afterwards every word is one symbol
  }

  test("driver and distributed regimes produce identical merge tables") {
    val df = corpus(
      "the quick brown fox jumps over the lazy dog",
      "the quicker brown foxes jumped over lazy dogs",
      "pack my box with five dozen liquor jugs",
      "how vexingly quick daft zebras jump")
    val driver = Bpe.learnMerges(df, "text", 6, driverMaxVocab = 1000000L)
      .collect().map(_.toSeq)
    val dist = Bpe.learnMerges(df, "text", 6, driverMaxVocab = 0L)
      .collect().map(_.toSeq)
    assert(driver.toSeq === dist.toSeq)
  }

  test("distributed regime leaves nothing in the cache manager") {
    spark.catalog.clearCache()
    Bpe.learnMerges(corpus("some words some more words"), "text", 3,
      driverMaxVocab = 0L).collect()
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("segments applies merges by rank and concatenates back to the word") {
    val df = corpus("low low lower lowest")
    val merges = Bpe.learnMerges(df, "text", 4).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val segs = df
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .select(col("w"), Bpe.segments(col("w"), merges).as("segs"))
      .collect()
    segs.foreach { r =>
      assert(r.getSeq[String](1).mkString === r.getString(0))
    }
    // the fully-merged frequent word segments to few symbols
    val low = segs.find(_.getString(0) == "low").get.getSeq[String](1)
    assert(low.length <= 2)
  }

  test("native segments == replace-chain segments on learned merges") {
    val df = corpus(
      "the quick brown fox jumps over the lazy dog",
      "lower lowest slower slowest low slow",
      "aaa aaaa ababab banana bandana")
    val merges = Bpe.learnMerges(df, "text", 12).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val words = df
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .distinct()
    val both = words.select(col("w"),
      Bpe.segments(col("w"), merges).as("native"),
      Bpe.segmentsViaReplace(col("w"), merges).as("chain")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2), s"word=${r.getString(0)}")
    }
  }

  test("segments survives production merge depth (3000 merges, one plan node)") {
    // a replace-chain at this depth would build a 3000-deep expression
    // tree; the native kernel carries the table as data. Vocabulary of
    // 512 distinct 10-char base-2 words ensures thousands of learnable
    // merges (every prefix/suffix combination keeps producing pairs).
    val words = (0 until 512).map(i =>
      (10 to 1 by -1).map(j => (('a' + ((i >> (j % 9)) & 1)).toChar)).mkString
        + Integer.toBinaryString(512 + i).substring(1).replace('0', 'x').replace('1', 'y'))
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = Bpe.learnMerges(df, "text", 3000).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.length > 100, s"expected deep merge table, got ${merges.length}")
    val segs = df.select(col("text").as("w"),
      Bpe.segments(col("w"), merges).as("segs")).collect()
    // invariants: concatenation restores the word; with this many merges
    // relative to vocab size, words collapse to very few symbols
    segs.foreach(r => assert(r.getSeq[String](1).mkString === r.getString(0)))
    val totalSyms = segs.map(_.getSeq[String](1).length).sum
    assert(totalSyms < words.map(_.length).sum,
      "merges should have reduced the symbol count")
  }

  test("tokenAccounting: hand-computed symbol counts per group") {
    // merges (l,o), (lo,w), (e,r): "low" -> [low] = 1 symbol,
    // "lower" -> [low, er] = 2 symbols
    val df = Seq((0L, "a", "low low lower"), (1L, "b", "low"))
      .toDF("doc_id", "src", "text")
    val merges = Bpe.learnMerges(df, "text", 3).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val acc = Bpe.tokenAccounting(df, "src", "text", merges).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(acc === Map("a" -> ((4L, 3L)), "b" -> ((1L, 1L))))
  }

  test("save/load round-trips the merge table in rank order") {
    val df = corpus("low low lower lowest slow slowest")
    val merges = Bpe.learnMerges(df, "text", 5)
    val tmp = java.nio.file.Files.createTempDirectory("bpe_merges").toFile
    try {
      Bpe.saveMerges(merges, tmp.getAbsolutePath)
      val loaded = Bpe.loadMerges(spark, tmp.getAbsolutePath)
      val direct = merges.orderBy(col("merge_rank")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      assert(loaded === direct)
      // a loaded tokenizer segments identically to the fresh one
      val w = Seq(Tuple1("slowest")).toDF("w")
      val a = w.select(Bpe.segments(col("w"), loaded)).collect()(0).getSeq[String](0)
      val b = w.select(Bpe.segments(col("w"), direct)).collect()(0).getSeq[String](0)
      assert(a === b)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(tmp)
    }
  }

  test("cpCompare orders supplementary-plane strings by code point") {
    // U+FFFD (replacement char, BMP) vs U+10400: code-point order puts
    // U+FFFD first; Java UTF-16 compareTo would sort the surrogate
    // (0xD801) BEFORE 0xFFFD — the divergence cpCompare exists to avoid
    val bmp = "�"
    val supp = new String(Character.toChars(0x10400))
    assert(Bpe.cpCompare(bmp, supp) < 0)
    assert(bmp.compareTo(supp) > 0) // the Java order really is different
    assert(Bpe.cpCompare(supp, supp) === 0)
    assert(Bpe.cpCompare("a", "ab") < 0)
  }
}
