package graft.stats

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the integer percentile/median arithmetic
  * `Anomaly` (and its DuckDB replays) rest on. The formulas are
  * duplicated here deliberately and checked against EXACT RATIONAL
  * references (BigInt cross-multiplication, no doubles): an off-by-one
  * in k/r or a wrong interpolation weight would survive a hash-match
  * test (both engines share the formula) but not these properties. */
object AnomalyPropertySpec extends Properties("AnomalyIntegerMath") {

  private val centsList: Gen[List[Long]] =
    Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-5000L, 5000L)))

  private val pGen: Gen[(Int, Int)] = for {
    den <- Gen.oneOf(2, 4, 10, 100)
    num <- Gen.chooseNum(0, den)
  } yield (num, den)

  /** The operator's integer threshold: t_num scaled by den (values
    * already integers here — the cent snap is upstream). */
  private def tNum(sorted: Vector[Long], num: Int, den: Int): BigInt = {
    val n = sorted.length
    val h = num.toLong * (n - 1)
    val k = (h / den).toInt
    val r = h % den
    val xk = BigInt(sorted(k))
    val xk1 = BigInt(sorted(math.min(k + 1, n - 1)))
    xk * (den - r) + xk1 * r
  }

  property("t_num/den is EXACTLY the type-7 rational percentile") = Prop.forAll(
    centsList, pGen) { case (xs, (num, den)) =>
    val sorted = xs.sorted.toVector
    val n = sorted.length
    val t = tNum(sorted, num, den)
    // rational reference: h = num(n-1)/den; t = x_⌊h⌋ + frac·(x_⌊h⌋₊₁ − x_⌊h⌋)
    // with frac = h − ⌊h⌋. All in BigInt over the common denominator den.
    val h = BigInt(num) * (n - 1)
    val k = (h / den).toInt
    val frac = h - BigInt(k) * den // numerator of frac over den
    val xk = BigInt(sorted(k))
    val xk1 = BigInt(sorted(math.min(k + 1, n - 1)))
    val ref = xk * den + frac * (xk1 - xk)
    t == ref
  }

  property("strictly-above count matches the rational comparison") = Prop.forAll(
    centsList, pGen) { case (xs, (num, den)) =>
    val sorted = xs.sorted.toVector
    val t = tNum(sorted, num, den)
    val viaInt = xs.count(c => BigInt(c) * den > t)
    // rational reference: c > t/den ⟺ c·den > t — the same cross-multiply,
    // but recomputed from the rational percentile above
    val h = BigInt(num) * (sorted.length - 1)
    val k = (h / den).toInt
    val frac = h - BigInt(k) * den
    val ref = xs.count { c =>
      val lhs = BigInt(c) * den
      val rhs = BigInt(sorted(k)) * den +
        frac * (BigInt(sorted(math.min(k + 1, sorted.length - 1))) - BigInt(sorted(k)))
      lhs > rhs
    }
    viaInt == ref
  }

  property("p0/p100 bound every value; t_num monotone in num") = Prop.forAll(centsList) { xs =>
    val sorted = xs.sorted.toVector
    val den = 100
    val ts = (0 to den).map(num => tNum(sorted, num, den))
    val lo = BigInt(sorted.head) * den
    val hi = BigInt(sorted.last) * den
    ts.head == lo && ts.last == hi && ts.sliding(2).forall(p => p(0) <= p(1))
  }

  property("x2-scaled median halves to the exact rational median") = Prop.forAll(
    centsList) { xs =>
    val s = xs.sorted.toVector
    val m = s.length
    val med2 =
      if (m % 2 == 1) 2 * s((m + 1) / 2 - 1)
      else s(m / 2 - 1) + s(m / 2)
    // rational reference: median·2 over the sorted multiset
    val ref2 =
      if (m % 2 == 1) BigInt(s(m / 2)) * 2
      else BigInt(s(m / 2 - 1)) + BigInt(s(m / 2))
    BigInt(med2) == ref2
  }
}

/** Properties of the int8 quantization arithmetic
  * ([[graft.ann.Int8QuantExpr]]'s scalar core, duplicated): codes bounded
  * at ±127, reconstruction error within the half-step bound, zero error
  * exactly when 127·q is divisible by the scale. */
object Int8QuantPropertySpec extends Properties("Int8QuantMath") {

  private val qVec: Gen[List[Long]] =
    Gen.chooseNum(1, 128).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1000000L, 1000000L)))

  private def quant(q: List[Long]): (Long, List[Long], List[Long]) = {
    val m = q.map(math.abs).foldLeft(0L)(math.max)
    if (m == 0L) (0L, q.map(_ => 0L), q.map(_ => 0L))
    else {
      val codes = q.map { qi =>
        val mag = (math.abs(qi) * 254L + m) / (2L * m)
        if (qi >= 0) mag else -mag
      }
      val errs = q.zip(codes).map { case (qi, c) => math.abs(127L * qi - c * m) }
      (m, codes, errs)
    }
  }

  property("codes bounded at ±127") = Prop.forAll(qVec) { q =>
    val (_, codes, _) = quant(q)
    codes.forall(c => c >= -127L && c <= 127L)
  }

  property("error within the half-step bound (m+1)/2") = Prop.forAll(qVec) { q =>
    val (m, _, errs) = quant(q)
    errs.forall(_ <= (m + 1) / 2)
  }

  property("max-magnitude component always codes to ±127 with zero error iff 127q % m == 0") =
    Prop.forAll(qVec) { q =>
      val (m, codes, errs) = quant(q)
      m == 0L || q.zip(codes.zip(errs)).forall { case (qi, (c, e)) =>
        (math.abs(qi) != m || math.abs(c) == 127L) &&
          ((e == 0L) == (127L * qi % m == 0L && math.abs(c) == math.abs(127L * qi / m)))
      }
    }
}
