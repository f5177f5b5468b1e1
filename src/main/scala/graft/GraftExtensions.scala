package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.expressions._

/** SQL registration for the native kernels: `graft_minhash(shingles, k)`,
  * `graft_simhash(tokens)`, `graft_cosine(a, b)`, `graft_hyperplane_sig
  * (vec, dim, planes)`, `graft_shingles(tokens, n)` become callable from
  * `spark.sql(...)` text, not just the Scala DSL.
  *
  * Two entry points:
  *  - [[GraftFunctions.register]] on a live session (tests, notebooks);
  *  - [[GraftSparkExtensions]] for
  *    `spark.sql.extensions=graft.GraftSparkExtensions` at session build.
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"$name must be an integer literal, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash" -> { args =>
      require(args.length == 2, "graft_minhash(shingles, k)")
      MinHashSignatureExpr(args.head, intArg(args(1), "k"))
    },
    "graft_simhash" -> { args =>
      require(args.length == 1, "graft_simhash(tokens)")
      SimHashExpr(args.head)
    },
    "graft_cosine" -> { args =>
      require(args.length == 2, "graft_cosine(a, b)")
      CosineSimExpr(args.head, args(1))
    },
    "graft_hyperplane_sig" -> { args =>
      require(args.length == 3 || args.length == 4, "graft_hyperplane_sig(vec, dim, planes[, offset])")
      HyperplaneSigExpr(args.head, intArg(args(1), "dim"), intArg(args(2), "planes"),
        if (args.length == 4) intArg(args(3), "offset") else 0)
    },
    "graft_shingles" -> { args =>
      require(args.length == 2, "graft_shingles(tokens, n)")
      WordShinglesExpr(args.head, intArg(args(1), "n"))
    },
    "graft_minhash_merge" -> { args =>
      require(args.length == 2, "graft_minhash_merge(sig, k)")
      MinHashMergeAgg(args.head, intArg(args(1), "k")).toAggregateExpression()
    },
    "graft_ngram_repetition" -> { args =>
      require(args.length == 2, "graft_ngram_repetition(tokens, n)")
      NgramRepetitionExpr(args.head, intArg(args(1), "n"))
    },
    "graft_char_entropy" -> { args =>
      require(args.length == 1, "graft_char_entropy(text)")
      CharEntropyExpr(args.head)
    },
    "graft_bloom_agg" -> { args =>
      require(args.length == 2 || args.length == 3, "graft_bloom_agg(hash, numBits[, numHashes])")
      BloomFilterAgg(args.head, intArg(args(1), "numBits").toLong,
        if (args.length == 3) intArg(args(2), "numHashes") else 7).toAggregateExpression()
    },
    "graft_kmv_sketch" -> { args =>
      require(args.length == 2, "graft_kmv_sketch(hash, k)")
      KmvDistinctAgg(args.head, intArg(args(1), "k")).toAggregateExpression()
    },
    "graft_misra_gries" -> { args =>
      require(args.length == 2, "graft_misra_gries(token, k)")
      MisraGriesAgg(args.head, intArg(args(1), "k")).toAggregateExpression()
    },
    "graft_countmin" -> { args =>
      // buckets = array of per-row grid coordinates (see CountMinAgg's
      // portable md5 convention — SQL callers build it with md5/conv)
      require(args.length == 3, "graft_countmin(buckets, depth, width)")
      CountMinAgg(args.head, intArg(args(1), "depth"), intArg(args(2), "width"))
        .toAggregateExpression()
    },
    "graft_bloom_contains" -> { args =>
      require(args.length == 2 || args.length == 3, "graft_bloom_contains(hash, bloomLiteral[, numHashes])")
      val bytes = args(1) match {
        case Literal(b: Array[Byte], _) => b
        case other => throw new IllegalArgumentException(s"bloom must be a binary literal, got $other")
      }
      BloomContainsExpr(args.head, bytes,
        if (args.length == 3) intArg(args(2), "numHashes") else 7)
    })

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `SparkSessionExtensions` hook (set `spark.sql.extensions` to this class
  * name). */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    // heap-based top-k-per-group: planner strategy for the custom node +
    // the optimizer rewrite that routes row_number()<=k window plans to it
    e.injectPlannerStrategy(_ => graft.plan.TopKPerGroupStrategy)
    e.injectOptimizerRule(_ => graft.plan.RewriteWindowTopK)
  }
}
