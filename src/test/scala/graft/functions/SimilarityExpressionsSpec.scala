package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{SimilarityFunctions => S, TextFunctions => T}

/** Native Catalyst kernels vs the declarative HOF formulations: same math,
  * two execution paths — they must agree (cosine to 1e-12; hash-family
  * kernels use different underlying string hashes, so those are checked on
  * semantic properties instead, in FunctionsSpec). */
class SimilarityExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine agrees with HOF cosine on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val pairs = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("id_b"), col("embedding").as("vb")))
      .filter(col("id_a") < col("id_b")).limit(2000)
    val diffs = pairs.select(
      abs(S.cosine(col("va"), col("vb")) - S.cosineHof(col("va"), col("vb"))).as("d"))
      .agg(max("d")).as[Double].collect()(0)
    assert(diffs < 1e-12, s"native vs HOF cosine diverged by $diffs")
  }

  test("native minhash signature has k components bounded by the prime") {
    val sig = Seq("a b c d e f g h i j").toDF("t")
      .select(S.minhashSignature(T.wordShingles(col("t"), 2), 64).as("s"))
      .as[Seq[Long]].collect()(0)
    assert(sig.length == 64)
    assert(sig.forall(v => v >= 0 && v < 2147483647L))
    // identical input -> identical signature across plans
    val sig2 = Seq("a b c d e f g h i j").toDF("t").repartition(3)
      .select(S.minhashSignature(T.wordShingles(col("t"), 2), 64).as("s"))
      .as[Seq[Long]].collect()(0)
    assert(sig == sig2)
  }

  test("native hyperplane signature is stable and within plane-bit range") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val sigs = e.select(graft.ann.Ann.hyperplaneSignature(col("embedding"), 64, 8).as("s"))
      .as[Long].collect()
    assert(sigs.forall(s => s >= 0 && s < 256))
    val sigs2 = e.repartition(5)
      .select(graft.ann.Ann.hyperplaneSignature(col("embedding"), 64, 8).as("s"))
      .as[Long].collect()
    assert(sigs.sorted.toSeq == sigs2.sorted.toSeq)
  }

  test("codegen and interpreted paths agree for minhash and cosine kernels") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    def run(): (Seq[Seq[Long]], Seq[Double], Seq[Long], Seq[Long]) = {
      val sigs = docs.select(S.minhashSignature(T.wordShingles(col("text"), 3), 32).as("s"))
        .as[Seq[Long]].collect().toSeq
      val cos = e.select(col("vec_id").as("ida"), col("embedding").as("va"))
        .crossJoin(e.select(col("vec_id").as("idb"), col("embedding").as("vb")))
        .filter(col("ida") < col("idb")).limit(300)
        .select(S.cosine(col("va"), col("vb")).as("c")).as[Double].collect().toSeq
      val sim = docs.select(S.simhash(T.tokens(col("text"))).as("f")).as[Long].collect().toSeq
      val hp = e.select(graft.ann.Ann.hyperplaneSignature(col("embedding"), 64, 12).as("h"))
        .as[Long].collect().toSeq
      (sigs, cos.sorted, sim, hp)
    }
    val (sigsGen, cosGen, simGen, hpGen) = run()
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevWhole = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val (sigsInt, cosInt, simInt, hpInt) = run()
      assert(sigsGen == sigsInt, "minhash codegen diverged from interpreted eval")
      assert(cosGen == cosInt, "cosine codegen diverged from interpreted eval")
      assert(simGen == simInt, "simhash codegen diverged from interpreted eval")
      assert(hpGen == hpInt, "hyperplane codegen diverged from interpreted eval")
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        v => spark.conf.set("spark.sql.codegen.factoryMode", v))
      spark.conf.set("spark.sql.codegen.wholeStage", prevWhole)
    }
  }

  test("native simhash: null elements ignored, empty array gives 0 votes fingerprint") {
    val fp = Seq(Seq.empty[String]).toDF("t")
      .select(S.simhash(col("t")).as("f")).as[Long].collect()(0)
    assert(fp == 0L) // all vote counts 0 -> no bits set
  }

  test("portable hash60 kernel equals the Spark-builtin md5 formulation") {
    // SimilarityKernels.hash60 (the JVM loop inside the portable
    // minhash/simhash kernels) must equal conv(substring(md5(s),1,15),16,10)
    // — the Column formulation Curate.portableHash60 exposes and the DuckDB
    // oracles replay. Compare both on real token strings (incl. unicode).
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(T.tokens(col("text"))).as("w"))
      .limit(5000)
      .select(col("w"), graft.curate.Curate.portableHash60(col("w")).as("builtin"))
      .as[(String, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, builtin) =>
      val viaKernel = graft.functions.expressions.SimilarityKernels.hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(w))
      assert(viaKernel == builtin, s"hash60 mismatch on '$w'")
    }
  }

  test("minhashBands hashes band slices: equal hash <=> equal slice (both hashers)") {
    // grounds MinhashBandPropertySpec's slice-level pigeonhole properties:
    // the Column band hash is a pure function of the band's slice, and on
    // real signatures distinct slices never collided (64-bit space)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    for (portable <- Seq(false, true)) {
      val rows = docs.select(
          S.minhashSignature(T.wordShingles(col("text"), 3), 64, portable).as("sig"))
        .select(col("sig"), S.minhashBands(col("sig"), 64, 16, portable).as("bh"))
        .as[(Seq[Long], Seq[Long])].collect()
      val slices = rows.map(_._1.grouped(4).toSeq)
      val hashes = rows.map(_._2)
      for (i <- rows.indices; j <- rows.indices; b <- 0 until 16) {
        assert((hashes(i)(b) == hashes(j)(b)) == (slices(i)(b) == slices(j)(b)),
          s"band-hash/slice equivalence broke at docs $i,$j band $b (portable=$portable)")
      }
    }
  }

  test("portable minhash/simhash kernels: deterministic, bounded, 60-bit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val sigs = docs.select(
        S.minhashSignature(T.wordShingles(col("text"), 3), 64, portable = true).as("s"))
      .as[Seq[Long]].collect()
    assert(sigs.forall(s => s.length == 64 && s.forall(v => v >= 0 && v < 2147483647L)))
    val fps = docs.select(S.simhash(T.tokens(col("text")), portable = true).as("f"))
      .as[Long].collect()
    assert(fps.forall(f => f >= 0 && f < (1L << 60))) // 60-bit fingerprints
    // plan-shape independence
    val sigs2 = docs.repartition(7).select(
        S.minhashSignature(T.wordShingles(col("text"), 3), 64, portable = true).as("s"))
      .as[Seq[Long]].collect()
    assert(sigs.map(_.mkString(",")).sorted.toSeq == sigs2.map(_.mkString(",")).sorted.toSeq)
  }
}
