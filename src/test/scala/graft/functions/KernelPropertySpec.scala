package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.expressions.{CollectListCappedAgg, NgramRepetitionExpr}

/** ScalaCheck properties for the new kernels, exercised at the expression
  * level (no Spark session — `nullSafeEval` / the aggregate's
  * update-merge-eval contract directly), so they run thousands of cases
  * cheaply. */
object KernelPropertySpec extends Properties("Kernels") {

  private val tokenGen: Gen[Seq[String]] =
    Gen.listOf(Gen.oneOf("a", "b", "c", "d", "xyz", "qq"))

  private def arrayData(tokens: Seq[String]) =
    new GenericArrayData(tokens.map(t => UTF8String.fromString(t)).toArray[Any])

  property("ngramRepetition matches a direct Scala reference implementation") =
    Prop.forAll(tokenGen, Gen.choose(1, 4)) { (tokens, n) =>
      val expr = NgramRepetitionExpr(
        BoundReference(0, ArrayType(StringType), nullable = false), n)
      val row = expr.nullSafeEval(arrayData(tokens)).asInstanceOf[InternalRow]
      val (gotTop, gotDup) = (row.getDouble(0), row.getDouble(1))
      val total = tokens.length - n + 1
      val (expTop, expDup) =
        if (total <= 0) (0.0, 0.0)
        else {
          val grams = tokens.sliding(n).map(_.mkString(" ")).toSeq
          val counts = grams.groupBy(identity).map(_._2.size)
          (counts.max.toDouble / total, 1.0 - counts.size.toDouble / total)
        }
      gotTop == expTop && gotDup == expDup
    }

  // drive the aggregate's contract directly: update into randomly-sized
  // partial buffers, merge in random order, eval.
  private def runAgg(values: Seq[Long], cap: Int, chunks: Int): Any = {
    val agg = CollectListCappedAgg(
      BoundReference(0, LongType, nullable = false), cap)
    val partials = values.grouped(math.max(1, math.ceil(values.size.toDouble / chunks).toInt))
      .map { chunk =>
        val buf = agg.createAggregationBuffer()
        chunk.foreach(v => agg.update(buf, new GenericInternalRow(Array[Any](v))))
        // round-trip serialization on every partial, like a real shuffle
        agg.deserialize(agg.serialize(buf))
      }.toSeq
    val merged = partials.reduceLeftOption { (a, b) =>
      agg.merge(a, b)
    }.getOrElse(agg.createAggregationBuffer())
    agg.eval(merged)
  }

  property("collectListCapped: defined iff group fits the cap; content preserved") =
    Prop.forAll(Gen.listOf(Gen.choose(0L, 100L)), Gen.choose(1, 20), Gen.choose(1, 5)) {
      (values, cap, chunks) =>
        runAgg(values, cap, chunks) match {
          case null =>
            values.size > cap
          case arr: GenericArrayData =>
            val got = arr.array.toSeq.map(_.asInstanceOf[Long]).sorted
            values.size <= cap && got == values.sorted
          case _ => false
        }
    }

  property("collectListCapped: buffers never exceed cap+1 elements") =
    Prop.forAll(Gen.listOf(Gen.choose(0L, 100L)), Gen.choose(1, 10)) { (values, cap) =>
      val agg = CollectListCappedAgg(
        BoundReference(0, LongType, nullable = false), cap)
      val buf = agg.createAggregationBuffer()
      values.foreach(v => agg.update(buf, new GenericInternalRow(Array[Any](v))))
      buf.length <= cap + 1
    }

  // Misra-Gries through the same update/serialize/merge/eval harness: the
  // mergeable-summaries guarantee (every item with count > n/(k+1)
  // survives; estimates are lower bounds off by ≤ n/(k+1)) must hold for
  // ANY partition split and merge order.
  private val mgStreamGen: Gen[Seq[String]] = for {
    hotMass <- Gen.listOf(Gen.oneOf("h1", "h2", "h3"))
    noise <- Gen.listOf(Gen.choose(0, 500).map("n" + _))
    shuffled <- Gen.const(scala.util.Random.shuffle(hotMass ++ hotMass ++ noise))
  } yield shuffled

  private def runMg(items: Seq[String], k: Int, chunks: Int): Map[String, Long] = {
    val agg = expressions.MisraGriesAgg(
      BoundReference(0, StringType, nullable = false), k)
    val partials = items.grouped(math.max(1, math.ceil(items.size.toDouble / chunks).toInt))
      .map { chunk =>
        val buf = agg.createAggregationBuffer()
        chunk.foreach(v => agg.update(buf,
          new GenericInternalRow(Array[Any](UTF8String.fromString(v)))))
        agg.deserialize(agg.serialize(buf))
      }.toSeq
    val merged = partials.reduceLeftOption((a, b) => agg.merge(a, b))
      .getOrElse(agg.createAggregationBuffer())
    val arr = agg.eval(merged).asInstanceOf[GenericArrayData]
    arr.array.map { r =>
      val row = r.asInstanceOf[InternalRow]
      row.getUTF8String(0).toString -> row.getLong(1)
    }.toMap
  }

  property("misraGries: heavy items survive any split; ests are bounded lower bounds") =
    Prop.forAll(mgStreamGen, Gen.choose(2, 12), Gen.choose(1, 6)) { (items, k, chunks) =>
      val out = runMg(items, k, chunks)
      val n = items.size.toLong
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val heavy = truth.collect { case (t, c) if c * (k + 1) > n => t }.toSet
      // merging m partials can add up to m * n_i/(k+1) error; the safe
      // global bound is still n/(k+1) total (Agarwal et al. Thm 1)
      val bound = n / (k + 1) + 1
      out.size <= k &&
        heavy.subsetOf(out.keySet) &&
        out.forall { case (t, e) => e <= truth(t) && truth(t) - e <= bound }
    }

  // ---------------------------------------------------------------- bloom

  import graft.functions.expressions.BloomKernels

  property("bloom: NO false negative under any insert order or word count") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.long), Gen.choose(1, 40)) { (xs, words) =>
      val w = new Array[Long](words)
      xs.foreach(BloomKernels.add(w, 7, _))
      xs.forall(BloomKernels.contains(w, 7, _))
    }

  property("bloom: add is idempotent and order-independent (bitwise OR algebra)") =
    Prop.forAll(Gen.listOf(Gen.long), Gen.choose(1, 20)) { (xs, words) =>
      val a = new Array[Long](words)
      val b = new Array[Long](words)
      xs.foreach(BloomKernels.add(a, 7, _))
      (xs.reverse ++ xs).foreach(BloomKernels.add(b, 7, _))
      a.toSeq == b.toSeq
    }

  // ------------------------------------------------------------------ kmv

  import graft.functions.expressions.KmvDistinctAgg

  private def runKmv(values: Seq[Long], k: Int, chunks: Int): Seq[Long] = {
    val agg = KmvDistinctAgg(BoundReference(0, LongType, nullable = false), k)
    val partials = values.grouped(math.max(1, math.ceil(values.size.toDouble / chunks).toInt))
      .map { chunk =>
        val buf = agg.createAggregationBuffer()
        chunk.foreach(v => agg.update(buf, new GenericInternalRow(Array[Any](v))))
        agg.deserialize(agg.serialize(buf))
      }.toSeq
    val merged = partials.reduceLeftOption((a, b) => agg.merge(a, b))
      .getOrElse(agg.createAggregationBuffer())
    agg.eval(merged).asInstanceOf[GenericArrayData].toLongArray().toSeq
  }

  property("kmv: equals the k smallest distinct values under any split") =
    Prop.forAll(Gen.listOf(Gen.long), Gen.choose(2, 32), Gen.choose(1, 7)) {
      (xs, k, chunks) =>
        runKmv(xs, k, chunks) == xs.distinct.sorted.take(k)
    }

  // ----------------------------------------------------------------- pack

  private def packRef(sizes: Seq[Int], cap: Int): Seq[Int] = {
    var acc = 0; var seq = -1
    sizes.map { n =>
      if (seq < 0 || acc + n > cap) { seq += 1; acc = n } else acc += n
      seq
    }
  }

  property("next-fit reference: bins within capacity except oversized singletons, " +
    "sequence ids contiguous from 0") =
    Prop.forAll(Gen.listOf(Gen.choose(1, 50)), Gen.choose(1, 80)) { (sizes, cap) =>
      val seqs = packRef(sizes, cap)
      val byBin = sizes.zip(seqs).groupBy(_._2).view.mapValues(_.map(_._1)).toMap
      val capOk = byBin.values.forall(b => b.sum <= cap || b.size == 1)
      val contiguous = seqs.isEmpty || seqs.distinct == (0 to seqs.max).toList
      val monotone = seqs.isEmpty || seqs.zip(seqs.tail).forall { case (a, b) => b == a || b == a + 1 }
      capOk && contiguous && monotone
    }
}
