package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Similarity primitives for dedup and nearest-neighbor search, expressed as
  * Spark SQL array expressions (codegen'd; no UDFs, no Python boundary).
  *
  * Scale notes: every function here is row-local — the expensive part of
  * dedup/ANN at 100 TB is the *candidate generation* (see
  * [[graft.dedup.Dedup]] / [[graft.ann.Ann]], which band/bucket so the
  * quadratic compare only happens within tiny buckets), not these kernels.
  */
object SimilarityFunctions {

  /** Mersenne-prime modulus for the MinHash permutation family. 2^31-1 keeps
    * a·h+b within a long under ANSI overflow checking (a,h < 2^31 ⇒ product
    * < 2^62) while leaving plenty of hash space for Jaccard estimation. */
  private val MinhashPrime = 2147483647L // 2^31 - 1

  /** Deterministic per-seed affine permutation parameters. */
  private def perm(seed: Int): (Long, Long) = {
    // SplitMix64-style scrambling of the seed — fixed constants, public
    // domain algorithm; gives well-spread odd multipliers.
    var z = seed.toLong * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    val a = math.abs(z ^ (z >>> 31)) % (MinhashPrime - 1) + 1
    var w = (seed.toLong + 0x9E3779B9L) * 0xC2B2AE3D27D4EB4FL
    w = (w ^ (w >>> 29)) * 0x165667B19E3779F9L
    val b = math.abs(w ^ (w >>> 32)) % MinhashPrime
    (a, b)
  }

  /** MinHash signature of a set of string shingles: for each of `k`
    * permutations h_i(x) = (a_i·xxhash64(x) + b_i) mod (2^31-1), the min
    * over the shingle set. Returns array<long> of length k.
    *
    * Single traversal: the accumulator is the whole k-length signature and
    * each shingle updates it via one zip_with against the constant
    * permutation-parameter array — k separate aggregate passes over the
    * shingle array cost ~50× more in the interpreted HOF path. */
  def minhashSignature(shingles: Column, k: Int = 64, portable: Boolean = false): Column =
    graft.functions.expressions.SimilarityExpressions.minhashSignature(shingles, k, portable)

  /** Pure-`functions._` formulation of [[minhashSignature]] — same math in
    * declarative HOFs. Kept for cross-checking the native kernel and as the
    * no-custom-code fallback; ~50× slower (interpreted lambda dispatch). */
  def minhashSignatureHof(shingles: Column, k: Int = 64): Column = {
    val hashes = transform(array_distinct(shingles), s => pmod(xxhash64(s), lit(MinhashPrime)))
    val params = array((0 until k).map { i =>
      val (a, b) = perm(i)
      struct(lit(a).as("a"), lit(b).as("b"))
    }: _*)
    aggregate(hashes, array_repeat(lit(MinhashPrime), k),
      (acc, h) => zip_with(acc, params, (m, p) =>
        least(m, pmod(h * p.getField("a") + p.getField("b"), lit(MinhashPrime)))))
  }

  /** Band hashes for LSH: split a k-length signature into `bands` bands of
    * k/bands rows each and hash each band. Docs sharing any band hash are
    * candidate duplicates. Returns array<long> of length `bands`. */
  def minhashBands(signature: Column, k: Int, bands: Int, portable: Boolean = false): Column = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val r = k / bands
    val bandHashes = (0 until bands).map { b =>
      val key = concat_ws("_", lit(b), concat_ws(",", slice(signature, b * r + 1, r)))
      // portable: the md5-based 60-bit hash a SQL oracle replays
      // (`CAST(concat('0x', substr(md5(key), 1, 15)) AS BIGINT)` in DuckDB)
      if (portable) graft.curate.Curate.portableHash60(key)
      else xxhash64(key)
    }
    array(bandHashes: _*)
  }

  /** Estimated Jaccard similarity of two equal-length MinHash signatures:
    * fraction of agreeing components. */
  def minhashJaccard(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(sigA)

  /** Exact Jaccard similarity of two string-array columns (as sets). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** 64-bit SimHash over a token array: per token, xxhash64; each of the 64
    * bit positions accumulates +1/-1 by bit value; positive sums set the
    * output bit. Near-duplicate docs differ in few bits (small Hamming
    * distance). */
  def simhash(tokensCol: Column, portable: Boolean = false): Column =
    graft.functions.expressions.SimilarityExpressions.simhash(tokensCol, portable)

  /** HOF formulation of [[simhash]] (see [[minhashSignatureHof]]). */
  def simhashHof(tokensCol: Column): Column = {
    val hashes = transform(tokensCol, t => xxhash64(t))
    // Single traversal: accumulator = per-bit vote counts; each token hash
    // updates all 64 via one zip_with against the constant mask array.
    val masks = array((0 until 64).map(j => lit(1L << j)): _*)
    val counts = aggregate(hashes, array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, masks, (c, m) =>
        c + when(h.bitwiseAND(m) =!= 0, lit(1L)).otherwise(lit(-1L))))
    aggregate(zip_with(counts, masks, (c, m) => when(c > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("int")

  /** Dot product of two numeric array columns in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), _ + _)

  /** L2 norm of a numeric array column. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two numeric array columns (double precision).
    * Zero-norm inputs yield 0.0 rather than NaN. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.expressions.SimilarityExpressions.cosine(a, b)

  /** HOF formulation of [[cosine]] (see [[minhashSignatureHof]]). */
  def cosineHof(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0, lit(0.0)).otherwise(dot(a, b) / denom)
  }
}
