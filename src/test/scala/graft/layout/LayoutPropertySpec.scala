package graft.layout

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the Morton-interleave kernel, checked against
  * a direct Scala reference (the Column version is pinned equal to the
  * same reference in LayoutSpec, so these properties transfer). */
object LayoutPropertySpec extends Properties("ZOrder") {

  private def refInterleave(xs: Seq[Long], bits: Int): Long = {
    var out = 0L
    for (i <- 0 until bits; (x, c) <- xs.zipWithIndex)
      out |= ((x >> i) & 1L) << (i * xs.size + c)
    out
  }

  private def deinterleave(z: Long, ncols: Int, bits: Int): Seq[Long] =
    (0 until ncols).map { c =>
      (0 until bits).foldLeft(0L)((acc, i) => acc | (((z >> (i * ncols + c)) & 1L) << i))
    }

  private val coord = Gen.choose(0L, 1023L)

  property("interleave/deinterleave round-trips (no bit lost or aliased)") =
    Prop.forAll(coord, coord, coord) { (x, y, w) =>
      deinterleave(refInterleave(Seq(x, y, w), 10), 3, 10) == Seq(x, y, w)
    }

  property("z-value is strictly monotone in each coordinate (others fixed)") =
    // each coordinate's bits land at fixed positions, so growing one
    // coordinate grows the number formed by those positions — the property
    // that makes per-file z-ranges translate into per-column ranges
    Prop.forAll(coord, coord, coord) { (a, b, y) =>
      (a == b) || {
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        refInterleave(Seq(lo, y), 10) < refInterleave(Seq(hi, y), 10) &&
        refInterleave(Seq(y, lo), 10) < refInterleave(Seq(y, hi), 10)
      }
    }

  property("z-value preserves dominance order (order-preservation per octant)") =
    // if p ≤ q in EVERY coordinate (p and q in the same dominance octant),
    // then z(p) ≤ z(q): every bit position of z is monotone in its source
    // coordinate bit and positions never interact. This is what makes a
    // z-range file skip sound for conjunctive range predicates.
    Prop.forAll(coord, coord, coord, coord, coord, coord) { (x1, y1, w1, dx, dy, dw) =>
      val (x2, y2, w2) = ((x1 + dx) min 1023L, (y1 + dy) min 1023L, (w1 + dw) min 1023L)
      refInterleave(Seq(x1, y1, w1), 10) <= refInterleave(Seq(x2, y2, w2), 10)
    }

  property("distinct inputs give distinct z-values (injective on the domain)") =
    Prop.forAll(coord, coord, coord, coord) { (x1, y1, x2, y2) =>
      ((x1, y1) == (x2, y2)) ||
        refInterleave(Seq(x1, y1), 10) != refInterleave(Seq(x2, y2), 10)
    }
}
