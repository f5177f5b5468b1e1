package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.expressions.CountMinAgg

/** ScalaCheck properties for the count-min aggregate's update-merge-eval
  * contract, driven at the expression level like [[KernelPropertySpec]]:
  * the never-undercount guarantee and merge-order invariance must hold
  * for ANY stream and ANY partitioning, not just the spec's fixtures. */
object CountMinPropertySpec extends Properties("CountMin") {

  private val D = 3
  private val W = 16

  // deterministic per-item buckets standing in for the md5 columns
  private def buckets(item: Int): Array[Long] =
    Array.tabulate(D)(j => math.floorMod(item * 2654435761L + j * 40503L, W))

  private def runAgg(items: Seq[Int], chunks: Int): Seq[Long] = {
    val agg = CountMinAgg(
      BoundReference(0, ArrayType(LongType, containsNull = true), nullable = true), D, W)
    val parts = if (chunks <= 1) Seq(items)
      else items.grouped(math.max(1, items.size / chunks)).toSeq
    val merged = parts
      .map { part =>
        part.foldLeft(agg.createAggregationBuffer()) { (buf, item) =>
          agg.update(buf, new GenericInternalRow(
            Array[Any](new GenericArrayData(buckets(item).toArray[Any]))))
        }
      }
      .reduceOption((a, b) => agg.merge(a, b))
      .getOrElse(agg.createAggregationBuffer())
    agg.eval(merged).asInstanceOf[GenericArrayData].toLongArray().toSeq
  }

  private def estimate(grid: Seq[Long], item: Int): Long =
    (0 until D).map(j => grid(j * W + buckets(item)(j).toInt)).min

  private val streamGen = Gen.listOf(Gen.choose(0, 40))

  property("estimates never undercount any item's true frequency") =
    Prop.forAll(streamGen) { items =>
      val grid = runAgg(items, chunks = 1)
      items.distinct.forall { it =>
        estimate(grid, it) >= items.count(_ == it)
      }
    }

  property("grid is invariant to how the stream was partitioned (merge ≡ single pass)") =
    Prop.forAll(streamGen, Gen.choose(1, 7)) { (items, chunks) =>
      runAgg(items, chunks) == runAgg(items, 1)
    }

  property("each grid row conserves the total stream count") =
    Prop.forAll(streamGen) { items =>
      val grid = runAgg(items, chunks = 1)
      (0 until D).forall(j => grid.slice(j * W, (j + 1) * W).sum == items.size.toLong)
    }
}
