package graft.dedup

import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.expressions.MinHashSignatureExpr

/** ScalaCheck properties for the MinHash band math — the guarantees the
  * LSH dedup tier rests on, exercised at the expression level (both the
  * xxhash64 and the portable md5-60 kernels) plus the banding scheme's
  * pigeonhole bound on constructed signatures. The Column-level band
  * hashing is pinned to slice equality in SimilarityExpressionsSpec, so
  * the slice-level properties transfer. */
object MinhashBandPropertySpec extends Properties("MinhashBands") {

  private val K = 32

  private def sig(shingles: Seq[String], portable: Boolean): Seq[Long] = {
    val expr = MinHashSignatureExpr(
      BoundReference(0, ArrayType(StringType), nullable = false), K, portable)
    expr.nullSafeEval(
      new GenericArrayData(shingles.map(s => UTF8String.fromString(s)).toArray[Any]))
      .asInstanceOf[GenericArrayData].toLongArray().toSeq
  }

  private val shingleGen: Gen[Seq[String]] =
    Gen.nonEmptyListOf(Gen.oneOf("a b c", "b c d", "c d e", "x y z", "q r s", "lone"))
  private val portableGen: Gen[Boolean] = Gen.oneOf(true, false)

  property("signature of a union = elementwise min of signatures (merge law)") =
    // the law behind MinHashMergeAgg / q46's group sketches: merging
    // per-doc signatures by elementwise min IS the signature of the
    // union of the shingle sets
    Prop.forAll(shingleGen, shingleGen, portableGen) { (a, b, portable) =>
      val merged = sig(a, portable).zip(sig(b, portable)).map { case (x, y) => math.min(x, y) }
      sig(a ++ b, portable) == merged
    }

  property("more shingles can only lower each component (containment monotone)") =
    Prop.forAll(shingleGen, shingleGen, portableGen) { (a, extra, portable) =>
      sig(a ++ extra, portable).zip(sig(a, portable)).forall { case (bigger, base) =>
        bigger <= base
      }
    }

  property("identical shingle SETS give identical signatures (duplicates, order)") =
    Prop.forAll(shingleGen, portableGen) { (a, portable) =>
      sig(a, portable) == sig(scala.util.Random.shuffle(a ++ a), portable)
    }

  // ------------------------------------------------- banding pigeonhole

  private def bandSlices(s: Seq[Long], bands: Int): Seq[Seq[Long]] =
    s.grouped(s.length / bands).toSeq

  property("pigeonhole: d differing components leave >= bands - d equal bands") =
    // the LSH completeness bound: a pair whose signatures disagree in
    // fewer components than there are bands ALWAYS shares a clean band
    // (=> band hashes collide => the pair is a candidate). This is the
    // deterministic skeleton of the 1-(1-s^r)^b banding curve: candidate
    // probability can only grow as signature agreement grows.
    Prop.forAll(shingleGen, Gen.choose(0, K - 1), Gen.oneOf(4, 8, 16), portableGen) {
      (a, d, bands, portable) =>
        val base = sig(a, portable)
        val positions = scala.util.Random.shuffle((0 until K).toList).take(d)
        val mutated = base.zipWithIndex.map { case (v, i) =>
          if (positions.contains(i)) v + 1 else v
        }
        val equalBands = bandSlices(base, bands).zip(bandSlices(mutated, bands))
          .count { case (x, y) => x == y }
        equalBands >= bands - d && (d == 0) == (equalBands == bands)
    }

  property("signature agreement = exact estimated-jaccard numerator") =
    // est_jaccard is (agreeing components)/k by definition; mutating d
    // positions leaves exactly k-d agreements — pins the estimate the
    // verify phase thresholds on
    Prop.forAll(shingleGen, Gen.choose(0, K), portableGen) { (a, d, portable) =>
      val base = sig(a, portable)
      val positions = scala.util.Random.shuffle((0 until K).toList).take(d)
      val mutated = base.zipWithIndex.map { case (v, i) =>
        if (positions.contains(i)) v - 1 else v // v-1 can't collide upward
      }
      base.zip(mutated).count { case (x, y) => x == y } == K - d
    }
}
