package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the similarity kernels.
  *
  * The pure-`functions._` formulations (aggregate/zip_with/transform) are
  * correct but interpreted: higher-order functions don't participate in
  * whole-stage codegen and pay per-element lambda dispatch + boxing. These
  * expressions evaluate the same math in tight primitive loops over
  * ArrayData — 10-50× on the dedup/ANN hot paths. Every expression also
  * implements doGenCode (inlined loops for the hash kernels, a per-row
  * call into the expression object for the allocation-heavy ones) so no
  * operator hosting them is ejected from whole-stage codegen — a single
  * CodegenFallback expression de-codegens its entire host operator.
  *
  * Hash/permutation constants are shared with
  * [[graft.functions.SimilarityFunctions]] so both formulations agree.
  */
object SimilarityKernels {

  /** Mersenne prime 2^31-1; a·h+b stays under 2^62 for a,h < 2^31. */
  val P: Long = 2147483647L
  val HashSeed: Long = 42L

  /** SplitMix64-scrambled affine permutation parameters (a_i, b_i). */
  def perm(seed: Int): (Long, Long) = {
    var z = seed.toLong * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    val a = math.abs(z ^ (z >>> 31)) % (P - 1) + 1
    var w = (seed.toLong + 0x9E3779B9L) * 0xC2B2AE3D27D4EB4FL
    w = (w ^ (w >>> 29)) * 0x165667B19E3779F9L
    val b = math.abs(w ^ (w >>> 32)) % P
    (a, b)
  }

  def hashString(s: org.apache.spark.unsafe.types.UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, HashSeed)

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Engine-portable 60-bit hash: the first 15 hex chars of md5, i.e.
    * `conv(substring(md5(s), 1, 15), 16, 10)` in Spark SQL and
    * `CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)` in DuckDB —
    * the same primitive [[graft.curate.Curate.portableHash60]] exposes as
    * a Column. Lets hash-seeded operators (MinHash/SimHash) be replayed
    * bit-for-bit by a SQL oracle. ~3× slower than XXH64 — use for
    * oracle-replayable paths, not the default hot path. */
  def hash60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = md5Digest.get().digest(s.getBytes)
    ((d(0) & 0xFFL) << 52) | ((d(1) & 0xFFL) << 44) | ((d(2) & 0xFFL) << 36) |
      ((d(3) & 0xFFL) << 28) | ((d(4) & 0xFFL) << 20) | ((d(5) & 0xFFL) << 12) |
      ((d(6) & 0xFFL) << 4) | ((d(7) & 0xFFL) >>> 4)
  }

  /** Deterministic hyperplane component in [-1, 1] (plane p, component c). */
  def planeComponent(p: Int, c: Int): Double = {
    var z = (p.toLong << 32 | c.toLong) * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)) & 0xFFFFFFL).toDouble / 0x7FFFFFL.toDouble - 1.0
  }
}

/** MinHash signature: array<string> shingles → array<long> of length k.
  * min_i over shingles of (a_i·h(s) mod P + b_i) mod P, where h is xxh64
  * by default or the engine-portable md5-based [[SimilarityKernels.hash60]]
  * when `portable` (so a SQL oracle can replay the signature exactly).
  * Duplicate shingles cannot change a min, so no dedupe pass is needed. */
case class MinHashSignatureExpr(child: Expression, k: Int, portable: Boolean = false)
    extends UnaryExpression {
  import SimilarityKernels._

  private lazy val as: Array[Long] = Array.tabulate(k)(i => perm(i)._1)
  private lazy val bs: Array[Long] = Array.tabulate(k)(i => perm(i)._2)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(input: Any): Any = nullSafeEval(input)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(P)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val hm = if (portable) hash60(s) % P
                 else { val h = hashString(s); ((h % P) + P) % P }
        var j = 0
        while (j < k) {
          val v = (as(j) * hm + bs(j)) % P
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    if (portable) {
      // per-row call into the expression object (the WordShinglesExpr
      // pattern) — enough to keep the host operator in whole-stage codegen
      return nullSafeCodeGen(ctx, ev, c => {
        val ref = ctx.addReferenceObj("minhashPortable", this, classOf[MinHashSignatureExpr].getName)
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);"
      })
    }
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val hm = ctx.freshName("hm")
      val v = ctx.freshName("v")
      s"""
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, ${P}L);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${HashSeed}L);
         |    long $hm = (($h % ${P}L) + ${P}L) % ${P}L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($asRef[$j] * $hm + $bsRef[$j]) % ${P}L;
         |      if ($v < $sig[$j]) $sig[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash: array<string> tokens → long fingerprint. 64 bits of xxh64 by
  * default; with `portable`, 60 bits of the md5-based
  * [[SimilarityKernels.hash60]] (60 because the portable hash is 60-bit —
  * a SQL oracle replays every bit). Fully codegen'd in the default path
  * (the bit-vote loop inlines into the enclosing whole-stage method). */
case class SimHashExpr(child: Expression, portable: Boolean = false) extends UnaryExpression {
  import SimilarityKernels._

  /** Fingerprint width: bits of the underlying hash that vote. */
  val bits: Int = if (portable) 60 else 64

  override def dataType: DataType = LongType

  def compute(input: Any): Any = nullSafeEval(input)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = if (portable) hash60(s) else hashString(s)
        var j = 0
        while (j < bits) {
          if (((h >>> j) & 1L) != 0L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    if (portable) {
      return nullSafeCodeGen(ctx, ev, c => {
        val ref = ctx.addReferenceObj("simhashPortable", this, classOf[SimHashExpr].getName)
        s"${ev.value} = ((java.lang.Long) $ref.compute($c)).longValue();"
      })
    }
    nullSafeCodeGen(ctx, ev, a => {
      val cnt = ctx.freshName("cnt")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $cnt = new int[64];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${HashSeed}L);
         |    for (int $j = 0; $j < 64; $j++) {
         |      if ((($h >>> $j) & 1L) != 0L) $cnt[$j]++; else $cnt[$j]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) { if ($cnt[$j] > 0) $out |= (1L << $j); }
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine similarity of two numeric arrays in double precision; 0.0 for
  * zero-norm inputs. Accepts float or double element types. Fully
  * codegen'd (doGenCode emits the primitive loop into the enclosing
  * whole-stage method, so the per-row virtual call disappears too). */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  private lazy val leftFloat = elemIsFloat(left)
  private lazy val rightFloat = elemIsFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    java.lang.Double.valueOf(if (denom == 0.0) 0.0 else dot / denom)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val getA = if (leftFloat) "getFloat" else "getDouble"
    val getB = if (rightFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.$getA($i);
         |  double $y = (double) $b.$getB($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Hyperplane sign signature: array<float|double> → long bucket id over
  * `planes` fixed hyperplanes starting at `planeOffset`. Fully codegen'd;
  * the plane matrix rides as a referenced object. */
case class HyperplaneSigExpr(child: Expression, dim: Int, planes: Int, planeOffset: Int)
    extends UnaryExpression {
  import SimilarityKernels._

  require(planes <= 63, "at most 63 planes per signature")

  // component-major matrix: m(c)(p)
  private lazy val m: Array[Array[Double]] =
    Array.tabulate(dim)(c => Array.tabulate(planes)(p => planeComponent(planeOffset + p, c)))
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    val dots = new Array[Double](planes)
    var c = 0
    while (c < n) {
      val x = if (isFloat) a.getFloat(c).toDouble else a.getDouble(c)
      val row = m(c)
      var p = 0
      while (p < planes) { dots(p) += x * row(p); p += 1 }
      c += 1
    }
    var sig = 0L
    var p = 0
    while (p < planes) { if (dots(p) > 0) sig |= (1L << p); p += 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val mRef = ctx.addReferenceObj("hyperplaneM", m, "double[][]")
    val getX = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val dots = ctx.freshName("dots")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val p = ctx.freshName("p")
      val x = ctx.freshName("x")
      val row = ctx.freshName("row")
      val sig = ctx.freshName("sig")
      s"""
         |double[] $dots = new double[$planes];
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |for (int $c = 0; $c < $n; $c++) {
         |  double $x = (double) $a.$getX($c);
         |  double[] $row = $mRef[$c];
         |  for (int $p = 0; $p < $planes; $p++) { $dots[$p] += $x * $row[$p]; }
         |}
         |long $sig = 0L;
         |for (int $p = 0; $p < $planes; $p++) { if ($dots[$p] > 0) $sig |= (1L << $p); }
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word n-gram shingles: array<string> tokens → array<string> of
  * space-joined n-token windows; fewer than n tokens collapse to one
  * shingle of the whole token list. One pass, byte-level concat — the HOF
  * slice+concat_ws formulation allocates a fresh array per window.
  *
  * doGenCode calls into the expression object rather than inlining the
  * loop, which is enough to matter: a CodegenFallback expression ejects
  * its ENTIRE host operator from whole-stage codegen
  * (CollapseCodegenStages rejects fallback expressions), splitting the
  * scan→tokenize→shingle→hash pipeline every dedup tier runs. */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String

  require(n >= 1, "shingle length must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  def compute(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("shingles", this, classOf[WordShinglesExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);"
    })

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    if (len < n) {
      new GenericArrayData(Array[Any](UTF8String.concatWs(space, toks: _*)))
    } else {
      val out = new Array[Any](len - n + 1)
      var s = 0
      while (s <= len - n) {
        val window = new Array[UTF8String](n)
        System.arraycopy(toks, s, window, 0, n)
        out(s) = UTF8String.concatWs(space, window: _*)
        s += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points. */
object SimilarityExpressions {
  def minhashSignature(shingles: Column, k: Int, portable: Boolean = false): Column =
    ExpressionUtils.column(MinHashSignatureExpr(ExpressionUtils.expression(shingles), k, portable))

  def simhash(tokens: Column, portable: Boolean = false): Column =
    ExpressionUtils.column(SimHashExpr(ExpressionUtils.expression(tokens), portable))

  def cosine(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def hyperplaneSignature(vec: Column, dim: Int, planes: Int, planeOffset: Int = 0): Column =
    ExpressionUtils.column(HyperplaneSigExpr(ExpressionUtils.expression(vec), dim, planes, planeOffset))

  def wordShingles(tokens: Column, n: Int): Column =
    ExpressionUtils.column(WordShinglesExpr(ExpressionUtils.expression(tokens), n))
}
