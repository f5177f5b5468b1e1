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
}
