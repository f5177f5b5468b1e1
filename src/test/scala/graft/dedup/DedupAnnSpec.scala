package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ann.Ann

class DedupAnnSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again today"), // near dup of 1
    (4L, "completely different content about spark query engines and shuffles here"),
    (5L, "another unrelated document mentioning minhash lsh banding techniques throughout")
  ).toDF("doc_id", "text")

  test("LSH pair generators leave nothing in the cache manager") {
    spark.catalog.clearCache()
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words here again now")).toDF("doc_id", "text")
    (1 to 2).foreach { _ =>
      assert(Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
        .collect().nonEmpty)
      assert(Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
        .collect().nonEmpty)
      assert(Dedup.exactJaccardPairs(docs, "doc_id", "text",
        tauNum = 1, tauDen = 2).collect().nonEmpty)
      Dedup.jaccardPairsAuto(docs, "doc_id", "text", tauNum = 1, tauDen = 2)
        ._1.collect()
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "a pair generator left persisted frames behind")
  }

  test("exact dedup groups identical content, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
    assert(out.count() == 4)
    val dupRow = out.filter(col("dup_count") === 2).collect()
    assert(dupRow.length == 1 && dupRow(0).getAs[Long]("keep_id") == 1L)
    val surv = Dedup.exactSurvivors(docs, "doc_id", "text")
    assert(surv.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngramJaccardPairs verifies candidates with true jaccard") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.99)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    // only the exact dup survives a 0.99 bar
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("nearDupSurvivors keeps the smallest id of each dup chain") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
    val survivors = Dedup.nearDupSurvivors(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors == Seq(1L, 4L, 5L)) // 2 and 3 fold into 1
  }

  test("simhash pairs: exact dup at hamming 0") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toMap2
    assert(pairs((1L, 2L)) == 0)
  }

  implicit class ToMap2(rows: Array[(Long, Long, Int)]) {
    def toMap2: Map[(Long, Long), Int] = rows.map(r => (r._1, r._2) -> r._3).toMap
  }

  test("embedding near-dup pairs via hyperplane buckets") {
    val vecs = Seq(
      (1L, Seq.tabulate(64)(i => if (i < 8) 1.0f else 0.0f)),
      (2L, Seq.tabulate(64)(i => if (i < 8) 0.99f else 0.01f)), // ~same direction
      (3L, Seq.tabulate(64)(i => if (i >= 56) 1.0f else 0.0f))  // orthogonal
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(vecs, "vec_id", "embedding", threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L))
  }

  test("dupSegmentFraction flags cross-document shared chunks") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j unique tail one two three four five six seven eight"),
      (2L, "a b c d e f g h i j different ending here with other words now present x"),
      (3L, "totally distinct content with no shared ten token runs at all anywhere z")
    ).toDF("doc_id", "text")
    val out = Dedup.dupSegmentFraction(corpus, "doc_id", "text", segLen = 10)
      .select("id", "dup_segment_frac").as[(Long, Double)].collect().toMap
    // docs 1 and 2 share their first 10-token segment; each has 2 segments
    // total, so the shared fraction is 1/2; doc 3 shares nothing
    assert(math.abs(out(1L) - 0.5) < 1e-9)
    assert(math.abs(out(2L) - 0.5) < 1e-9)
    assert(out(3L) == 0.0)
  }

  test("stripDuplicatedSegments removes shared chunks, keeps order, counts both sides") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j unique tail one two three four five six seven eight"),
      (2L, "a b c d e f g h i j different ending here with other words now present x"),
      (3L, "totally distinct content with no shared ten token runs at all anywhere z"),
      (4L, "a b c d e f g h i j") // ONLY the shared segment -> stripped empty
    ).toDF("doc_id", "text")
    val out = Dedup.stripDuplicatedSegments(corpus, "doc_id", "text", segLen = 10)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // the shared first segment (3 occurrences) goes; each doc's own tail stays
    assert(out(1L) == ((1L, "unique tail one two three four five six seven eight", 1L, 1L)))
    assert(out(2L) == ((2L, "different ending here with other words now present x", 1L, 1L)))
    // doc 3's both segments are unique -> reassembled text == original
    assert(out(3L)._2 == "totally distinct content with no shared ten token runs at all anywhere z"
      && out(3L)._4 == 0L)
    // a doc that WAS only boilerplate survives with empty text, not a crash
    assert(out(4L) == ((4L, "", 0L, 1L)))
  }

  test("duplicateClusters finds connected components with min-id labels") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain -> cluster 1
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle -> cluster 10
      (20L, 21L) // isolated pair -> cluster 20
    ).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("mergeClusters: delta fold equals full recompute for every merge shape") {
    // stored graph: {1,2,3} root 1, {10,11} root 10, {20,21} root 20
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("id_a", "id_b")
    val stored = Dedup.duplicateClusters(oldPairs)
    // delta exercises every shape at once: a NEW doc (5) bridging two old
    // clusters (members 3 and 11, neither a root), new-new pair (30,31),
    // new evidence between two old clusters (21-2), an intra-cluster pair
    // (1-3, pure self-loop after contraction), and an old never-clustered
    // doc (40) joining a new one (41)
    val delta = Seq(
      (3L, 5L), (5L, 11L), (30L, 31L), (21L, 2L), (1L, 3L), (40L, 41L)
    ).toDF("id_a", "id_b")
    val merged = Dedup.mergeClusters(stored, delta)
      .as[(Long, Long)].collect().toMap
    val full = Dedup.duplicateClusters(oldPairs.unionByName(delta))
      .as[(Long, Long)].collect().toMap
    assert(merged == full)
    // and the merged component really is the union: everything reachable
    // labels to the global min, 1
    assert(Set(1L, 2L, 3L, 5L, 10L, 11L, 20L, 21L).forall(full(_) == 1L))
    assert(full(30L) == 30L && full(31L) == 30L && full(41L) == 40L)
  }

  test("mergeClusters ≡ full recompute on seeded random graphs and random store/delta splits") {
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { round =>
      val edges = (1 to 120)
        .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(p => p._1 != p._2)
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
        .distinct
      val (oldE, deltaE) = edges.partition(_ => rnd.nextBoolean())
      // degenerate splits (all-old / all-delta) are valid and land here
      // occasionally by construction — both must still hold
      val stored =
        if (oldE.isEmpty) Seq.empty[(Long, Long)].toDF("id", "cluster_id")
        else Dedup.duplicateClusters(oldE.toDF("id_a", "id_b"))
      val merged = Dedup.mergeClusters(stored, deltaE.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      val full = Dedup.duplicateClusters(edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(merged == full, s"random graph round $round diverged")
    }
  }

  test("mergeClusters: empty and no-op deltas leave the store unchanged") {
    val oldPairs = Seq((1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val stored = Dedup.duplicateClusters(oldPairs)
    val expect = stored.as[(Long, Long)].collect().toSet
    val selfLoopOnly = Seq((1L, 2L)).toDF("id_a", "id_b") // contracts to (1,1)
    assert(Dedup.mergeClusters(stored, selfLoopOnly)
      .as[(Long, Long)].collect().toSet == expect)
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.mergeClusters(stored, empty)
      .as[(Long, Long)].collect().toSet == expect)
  }

  test("duplicateClusters driver fast path matches the distributed path on a random graph") {
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 300).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct.toDF("id_a", "id_b")
    val fast = Dedup.duplicateClusters(pairs).as[(Long, Long)].collect().toSet
    val dist = Dedup.duplicateClusters(pairs, driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toSet
    assert(fast.nonEmpty && fast == dist)
  }

  test("duplicateClusters string ids: both paths agree on supplementary characters") {
    // U+FF61 sorts BELOW U+10000 in code-point (UTF8String) order but ABOVE
    // its surrogate pair in UTF-16 code-unit order — the classic divergence
    // between Catalyst min() and java.lang.String.compareTo
    val bmp = "｡"
    val astral = "𐀀" // U+10000
    val pairs = Seq((bmp, astral), (astral, "𐀁")).toDF("id_a", "id_b")
    val fast = Dedup.duplicateClusters(pairs).as[(String, String)].collect().toSet
    val dist = Dedup.duplicateClusters(pairs, driverMaxEdges = 0L)
      .as[(String, String)].collect().toSet
    assert(fast == dist)
    assert(fast.forall(_._2 == bmp), s"root must be the code-point min: $fast")
  }

  test("bestPerCluster keeps the best-quality member per cluster plus singletons") {
    val df = Seq((1L, 5), (2L, 9), (3L, 9), (4L, 3), (5L, 1), (6L, 7))
      .toDF("id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val got = Dedup.bestPerCluster(df, "id", pairs, col("q"))
      .as[Long].collect().toSet
    // cluster {1,2,3}: max q=9 tied between 2 and 3 -> smallest id 2;
    // cluster {4,5}: 4; unclustered 6 survives
    assert(got == Set(2L, 4L, 6L))
  }

  test("bestPerCluster works with string ids (type-generic tie-break)") {
    val df = Seq(("a", 5), ("b", 9), ("c", 9), ("z", 7)).toDF("id", "q")
    val pairs = Seq(("a", "b"), ("b", "c")).toDF("id_a", "id_b")
    val got = Dedup.bestPerCluster(df, "id", pairs, col("q"))
      .as[String].collect().toSet
    assert(got == Set("b", "z")) // q=9 tie between b,c -> smallest id b
  }

  test("incremental dedup against a stored signature index") {
    val index = Dedup.minhashSignatures(docs, "doc_id", "text")
    val newBatch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"), // dup of corpus doc 1
      (11L, "a genuinely new document with fresh content nobody has seen before"),
      (12L, "a genuinely new document with fresh content nobody has seen before!") // near-dup of 11 within batch
    ).toDF("doc_id", "text")
    val newSigs = Dedup.minhashSignatures(newBatch, "doc_id", "text")
    val pairs = Dedup.minhashPairsAgainstIndex(index, newSigs, threshold = 0.5)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 1L)) && pairs.contains((10L, 2L)))
    assert(!pairs.exists(_._1 == 11L))
    // admission: 10 rejected (index dup), 12 rejected (in-batch dup of 11)
    val admitted = Dedup.admitAgainstIndex(newBatch, index, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(admitted == Seq(11L))
    // the PORTABLE (md5) hash family finds the same planted dups — the
    // oracle-replayable path q109 runs
    val pIndex = Dedup.minhashSignatures(docs, "doc_id", "text", portable = true)
    val pNew = Dedup.minhashSignatures(newBatch, "doc_id", "text", portable = true)
    val pPairs = Dedup.minhashPairsAgainstIndex(pIndex, pNew, threshold = 0.5, portable = true)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(pPairs.contains((10L, 1L)) && !pPairs.exists(_._1 == 11L))
  }

  test("semantic admission against a stored IVF index") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val base = emb.filter(col("vec_id") % 4 =!= 1)
    val model = graft.ann.Ivf.fit(base, "vec_id", "embedding", numCells = 8, iterations = 2)
    val index = graft.ann.Ivf.assign(base, "embedding", model)
      .select(col("vec_id").as("nid"), col("embedding").as("nvec"), col("cell"))
      .localCheckpoint(true)
    // a batch vector IDENTICAL to a stored one must reject (cos = 1 in its
    // own cell); take a stored vector under a fresh id
    val cloneRow = base.limit(1)
      .select(lit(900001L).as("vec_id"), col("embedding"))
    val batch = emb.filter(col("vec_id") % 4 === 1).unionByName(cloneRow)
      // and a null-embedding row, which must be dropped
      .unionByName(cloneRow.select(lit(900002L).as("vec_id"),
        lit(null).cast(cloneRow.schema("embedding").dataType).as("embedding")))
    val res = Dedup.semanticAdmitAgainstIndex(index, batch, model,
      "vec_id", "embedding", threshold = 0.42624, nProbes = 4)
      .select("vec_id", "cell", "admitted").as[(Long, Int, Int)].collect()
    val verdicts = res.map(r => r._1 -> r._3).toMap
    assert(!verdicts.contains(900002L), "null-embedding row must be dropped")
    assert(verdicts(900001L) == 0, "exact clone of a stored vector must reject")
    assert(verdicts.values.exists(_ == 1), "some batch vectors must admit")
    // cell = where an admitted vector lands on append (top-1 assignment)
    val assignedCells = graft.ann.Ivf.assign(
        batch.filter(col("embedding").isNotNull), "embedding", model)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(res.forall(r => r._2 == assignedCells(r._1)))
    // decisions are per-vector against the STORED corpus only — batch
    // order / micro-batch boundaries cannot change them
    val half1 = Dedup.semanticAdmitAgainstIndex(index,
      batch.filter(col("vec_id") % 2 === 0), model,
      "vec_id", "embedding", threshold = 0.42624, nProbes = 4)
    val half2 = Dedup.semanticAdmitAgainstIndex(index,
      batch.filter(col("vec_id") % 2 =!= 0), model,
      "vec_id", "embedding", threshold = 0.42624, nProbes = 4)
    val split = (half1.unionByName(half2))
      .select("vec_id", "cell", "admitted").as[(Long, Int, Int)].collect()
    assert(split.sortBy(_._1).toSeq == res.sortBy(_._1).toSeq)
  }

  test("decontamination flags n-gram overlap with the benchmark set") {
    val benchmark = Seq(
      (100L, "what is the capital of france paris is the capital of france")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "trivia dump says the capital of france paris is a city"), // shares 3-grams
      (2L, "entirely unrelated text about distributed shuffle hash joins")
    ).toDF("doc_id", "text")
    val report = Dedup.contaminationReport(corpus, benchmark, "doc_id", "text", n = 3)
      .select("id", "n_shared_ngrams").as[(Long, Long)].collect().toMap
    assert(report.contains(1L) && report(1L) >= 1)
    assert(!report.contains(2L))
    val survivors = Dedup.decontaminate(corpus, benchmark, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSeq
    assert(survivors == Seq(2L))
    // docs shorter than n tokens have no n-grams: identical short/blank
    // docs on both sides must NOT count as contamination
    val shortB = Seq((100L, "too short"), (101L, "")).toDF("doc_id", "text")
    val shortC = Seq((1L, "too short"), (2L, "")).toDF("doc_id", "text")
    assert(Dedup.contaminationReport(shortC, shortB, "doc_id", "text", n = 3).count() == 0)
  }

  test("LSH top-k recall vs brute force on real embeddings") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") % 100 === 0)
    val exact = Ann.bruteForceTopK(e, q, "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = Ann.lshTopK(e, q, "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    // The sf0.001 corpus has weak neighbors (best cos ≈ 0.33), so per-plane
    // sign agreement is only ~0.6 — 4 tables × 6 planes with multiprobe
    // gives ~0.6 expected recall here; denser corpora do far better.
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"LSH recall $recall too low")
    // rank is always within k and qid never equals nid
    assert(!approx.exists(p => p._1 == p._2))
  }

  test("semanticPrune keeps one representative per embedding near-dup group") {
    // 30 well-separated base directions in R^8 (one-hot-ish with distinct
    // off-axis noise), each duplicated 1-3x with tiny perturbations: the
    // perturbed copies are cos > 0.999 to their base, bases are cos < 0.7
    // to each other
    val rows = (0 until 30).flatMap { b =>
      val base = Array.tabulate(8)(d => if (d == b % 8) 10.0f else 0.3f * ((b * 7 + d) % 5))
      val copies = b % 3 + 1
      (0 until copies).map { c =>
        val v = base.clone()
        v(0) = v(0) + 0.001f * c
        (b.toLong * 10 + c, v.toSeq)
      }
    }
    val df = rows.toDF("vec_id", "embedding")
    val kept = Dedup.semanticPrune(df, "vec_id", "embedding",
        numCells = 6, probes = 3, threshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    // exactly one survivor per base group, and it is the smallest id
    assert(kept.size == 30, s"expected 30 survivors, got ${kept.size}")
    assert((0 until 30).forall(b => kept.contains(b.toLong * 10)))
    // deterministic: same survivors on a re-run
    val again = Dedup.semanticPrune(df, "vec_id", "embedding",
        numCells = 6, probes = 3, threshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    assert(again == kept)
  }
}
