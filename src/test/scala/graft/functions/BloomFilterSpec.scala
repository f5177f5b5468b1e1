package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.SparkSpec
import graft.dedup.Dedup
import graft.functions.expressions.{BloomFilterOps => B, BloomKernels}

class BloomFilterSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  test("kernel: no false negatives, low false-positive rate at 16 bits/elem") {
    val inserted = (0L until 2000L).map(i => BloomKernels.mix(i) * 31L + i)
    val words = new Array[Long](BloomKernels.numWords(inserted.size, 16))
    inserted.foreach(BloomKernels.add(words, 7, _))
    assert(inserted.forall(BloomKernels.contains(words, 7, _)))
    val probes = (1L to 100000L).map(i => BloomKernels.mix(-i) ^ i)
    val fp = probes.count(BloomKernels.contains(words, 7, _))
    assert(fp < 100, s"false-positive count $fp out of 100k — filter badly tuned") // expect ~40
  }

  test("serialization round-trips and merge is bitwise OR") {
    val a = new Array[Long](64)
    val b = new Array[Long](64)
    BloomKernels.add(a, 7, 12345L)
    BloomKernels.add(b, 7, 67890L)
    val rt = BloomKernels.fromBytes(BloomKernels.toBytes(a))
    assert(rt.toSeq == a.toSeq)
    assert(BloomKernels.contains(a, 7, 12345L) && !BloomKernels.contains(a, 7, 67890L))
  }

  test("aggregate builds the same filter as a driver-side loop (partials merge exactly)") {
    val hashes = (1L to 5000L).map(i => i * 0x9E3779B97F4A7C15L)
    val numBits = 64L * BloomKernels.numWords(hashes.size, 16)
    val fromAgg = hashes.toDF("h").repartition(8)
      .select(B.bloomAgg(col("h"), numBits).as("bf"))
      .head().getAs[Array[Byte]](0)
    val words = new Array[Long](math.toIntExact(numBits / 64L))
    hashes.foreach(BloomKernels.add(words, 7, _))
    assert(fromAgg.toSeq == BloomKernels.toBytes(words).toSeq)
  }

  test("bloomContains filters inside whole-stage codegen (no fallback ejection)") {
    val words = new Array[Long](16)
    (1L to 10L).foreach(i => BloomKernels.add(words, 7, i))
    val df = spark.range(1L, 101L).select(col("id").as("h"))
      .filter(B.bloomContains(col("h"), BloomKernels.toBytes(words)))
    assert(df.as[Long].collect().toSet.intersect((1L to 10L).toSet) == (1L to 10L).toSet)
    // codegen stages print as "*(n) Operator"; the Filter hosting the probe
    // must sit inside one (a CodegenFallback probe would strip the star)
    val plan = df.queryExecution.executedPlan.toString
    val filterLine = plan.linesIterator.find(_.contains("Filter")).get
    assert(filterLine.contains("*("), s"probe fell out of codegen:\n$plan")
  }

  test("SQL surface: graft_bloom_agg round-trips through graft_bloom_contains") {
    graft.GraftFunctions.register(spark)
    (1L to 100L).toDF("h").createOrReplaceTempView("bloom_in")
    val bytes = spark.sql("SELECT graft_bloom_agg(h, 4096) AS bf FROM bloom_in")
      .head().getAs[Array[Byte]](0)
    val hits = (1L to 1000L).toDF("h")
      .filter(B.bloomContains(col("h"), bytes))
      .as[Long].collect().toSet
    assert((1L to 100L).toSet.subsetOf(hits))
  }

  test("bloomDecontaminate matches the exact broadcast-join path") {
    val docs = (0 until 120).map { i =>
      // non-contaminated docs share NO 3-gram with each other (every token
      // carries the doc index)
      val text =
        if (i % 10 == 0) s"shared secret benchmark passage number ${i % 3} end"
        else (0 until 8).map(t => s"u${i}x$t").mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 4 =!= 0)
    val bench = docs.filter(col("doc_id") % 4 === 0)
    val viaBloom = Dedup.bloomDecontaminate(corpus, bench, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    val exact = Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(viaBloom == exact)
    assert(exact.nonEmpty && exact.size < 90) // some survivors, some dropped
  }
}
