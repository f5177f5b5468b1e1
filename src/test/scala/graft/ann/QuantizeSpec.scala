package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(0.5f, -0.25f, 0.0f, 0.125f)),
    (2L, Array(0.000001f, -0.000001f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)) // all-zero: qmax 0, everything 0
  ).toDF("vec_id", "embedding")

  test("int8Summary: hand-computed scale/code/error arithmetic") {
    val got = Quantize.int8Summary(vecs, "vec_id", "embedding")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // v1: q = (500000, -250000, 0, 125000), qmax = 500000
    //   codes: 500000 -> 127; 250000 -> (250000*254+500000)/1000000 = 64 (half-up
    //   of 63.5); 125000 -> (125000*254+500000)/1000000 = 32 (half-up of 31.75
    //   floors to 32? (31750000+500000)/1000000 = 32.25 -> 32); code_l1 = 223
    //   err: |127*500000-127*500000|=0; |-31750000+32000000|=250000 (code -64);
    //   |127*125000-32*500000|=|15875000-16000000|=125000; err_l1 = 375000
    assert(got(1L) == ((500000L, 223L, 375000L)))
    // v2: q = (1, -1, 0, 0), qmax = 1; codes ±127 exactly, zero error
    assert(got(2L) == ((1L, 254L, 0L)))
    // v3: all zero
    assert(got(3L) == ((0L, 0L, 0L)))
  }

  test("int8Codes round-trip: codes bounded at ±127 and reconstruct within half a step") {
    val codes = Quantize.int8Codes(vecs, "vec_id", "embedding")
      .select(col("vec_id"), col("qmax"), col("codes"))
      .as[(Long, Long, Seq[Byte])].collect()
    for ((_, qmax, cs) <- codes; c <- cs) {
      assert(c >= -127 && c <= 127)
      // reconstruction c*qmax/127 is within half a quantization step of q
      // (checked exactly by the err arithmetic in the summary test)
      assert(math.abs(c.toLong) <= 127L || qmax == 0L)
    }
  }

  test("empty vector yields the zero row; null vector yields a null row") {
    // pinned because the q119 oracle mirrors exactly this: unnest drops
    // empty/null vectors, so its vec_id set comes from the table with
    // COALESCE-to-0 for empties and pass-through NULL for null vectors
    val edge = Seq((1L, Some(Array.empty[Float])), (2L, None))
      .toDF("vec_id", "embedding")
    val got = Quantize.int8Summary(edge, "vec_id", "embedding")
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((Some(0L), Some(0L), Some(0L))))
    assert(got(2L) == ((None, None, None)))
  }

  test("summary is partitioning-invariant (row-local kernel)") {
    val a = Quantize.int8Summary(vecs, "vec_id", "embedding")
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Quantize.int8Summary(vecs.repartition(5), "vec_id", "embedding")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b)
  }
}
