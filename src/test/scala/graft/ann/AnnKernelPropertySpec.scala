package graft.ann

import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.expressions.{HyperplaneSigExpr, SimilarityKernels}

/** ScalaCheck properties for the ANN bucketing kernels, exercised at the
  * expression level (no Spark session). These kernels now back EXACT
  * DuckDB oracles (q25/q32 replay the plane matrix as SQL literals), so a
  * drift between the kernel and a naive model would surface as a
  * hash-match failure two layers away — pin it here instead. */
object AnnKernelPropertySpec extends Properties("AnnKernels") {

  private val vecGen: Gen[Array[Double]] =
    Gen.choose(4, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-1.0, 1.0)).map(_.toArray))

  private def naiveSignature(v: Array[Double], dim: Int, planes: Int, off: Int): Long = {
    var sig = 0L
    for (p <- 0 until planes) {
      var dot = 0.0
      for (c <- 0 until math.min(v.length, dim))
        dot += v(c) * SimilarityKernels.planeComponent(off + p, c)
      if (dot > 0) sig |= (1L << p)
    }
    sig
  }

  property("hyperplane signature matches the naive per-plane dot model") =
    Prop.forAll(vecGen, Gen.choose(1, 12), Gen.choose(0, 3)) { (v, planes, table) =>
      val expr = HyperplaneSigExpr(
        BoundReference(0, ArrayType(DoubleType), nullable = false),
        dim = 64, planes = planes, planeOffset = table * planes)
      val got = expr.nullSafeEval(new GenericArrayData(v.map(x => x: Any))).asInstanceOf[Long]
      got == naiveSignature(v, 64, planes, table * planes)
    }

  property("nearest cells = ascending-distance prefix of a full argsort") =
    Prop.forAll(vecGen, Gen.choose(2, 8), Gen.choose(1, 10)) { (v, k, nProbes) =>
      // deterministic centroid set derived from the plane constants so the
      // property needs no second generator
      val centroids = Array.tabulate(k)(i =>
        Array.tabulate(v.length)(c => SimilarityKernels.planeComponent(i, c)))
      val expr = NearestCellsExpr(
        BoundReference(0, ArrayType(DoubleType), nullable = false), centroids, nProbes)
      val got = expr.nullSafeEval(new GenericArrayData(v.map(x => x: Any)))
        .asInstanceOf[ArrayData].toIntArray().toSeq
      // the expression quantizes inputs onto the Ivf.QScale grid (round 6:
      // deterministic replayable fit) — the naive model must too
      def d2(cen: Array[Double]) =
        v.zip(cen).map { case (x, y) =>
          val q = math.floor(x * graft.ann.Ivf.QScale + 0.5)
          (q - y) * (q - y)
        }.sum
      val want = centroids.indices.sortBy(i => d2(centroids(i))).take(math.min(nProbes, k))
      // sortBy is stable and distances here are generically distinct;
      // compare by DISTANCE not index so an exact tie cannot flake
      got.length == want.length &&
        got.zip(want).forall { case (g, w) => d2(centroids(g)) == d2(centroids(w)) }
    }
}
