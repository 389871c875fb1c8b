package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SQL registration of the graft custom expressions, so `spark.sql`
  * users get the same surface as the DataFrame API. Two entry points:
  *
  *  - session builder: `.withExtensions(new GraftExtensions)`
  *  - live session: `GraftFunctions.register(spark)` (temp functions)
  *
  * Nothing in the core surface needs injected rules or strategies
  * (SURVEY §4) — function registration is the only extension point the
  * engine uses.
  */
object GraftFunctions {

  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("rolling_hash", "rolling_hash(str) - polynomial rolling hash",
      args => RollingHash(args.head, RollingHash.DefaultPrime)),
    ("dot_product", "dot_product(a, b) - dot product of two double arrays",
      args => DotProduct(args(0), args(1))),
    ("word_shingles", "word_shingles(str, n) - distinct word n-gram shingles",
      args => WordShingles(args(0), intArg(args(1)))),
    ("shingle_hashes", "shingle_hashes(str, n, mod) - 60-bit md5 shingle hashes",
      args => ShingleHashes(args(0), intArg(args(1)), longArg(args(2)))),
    ("simhash", "simhash(hashes) - 60-bit simhash of a hash array",
      args => SimHash(args.head, 60)),
    ("minhash_sig", "minhash_sig(hashes, k, prime) - minhash signature array",
      args => MinHashSig(args(0), intArg(args(1)), longArg(args(2)))),
    ("media_embed", "media_embed(str, dim, stride) - stub media embedding (ASCII-scaled codepoints)",
      args => MediaEmbed(args(0), intArg(args(1)), intArg(args(2)))),
    ("deflate_size", "deflate_size(str) - DEFLATE-compressed size of the UTF-8 bytes",
      args => DeflateSize(args.head)),
    ("lsh_buckets", "lsh_buckets(vec, tables, bits, dim) - sign-LSH bucket ids per table",
      args => LshBuckets(args(0), intArg(args(1)), intArg(args(2)), intArg(args(3)))),
    // bare AggregateFunction: the analyzer wraps it (and handles
    // DISTINCT) exactly as for built-in aggregates
    ("top_k_by_score", "top_k_by_score(score, id, k) - top-k (score, id) structs per group, O(k) state",
      args => TopKByScore(args(0), args(1), intArg(args(2)))),
    // Spark's own runtime-filter bloom machinery, surfaced as SQL
    // functions (it ships unregistered): the sketch side feeds on
    // xxhash64(value) longs, the probe side requires a CONSTANT bloom
    // (a collected literal or scalar subquery) and compiles to a
    // codegen'd bitset test — no false negatives by construction
    ("bloom_filter_agg",
      "bloom_filter_agg(xxhash64(col)[, est_items[, num_bits]]) - serialized bloom sketch",
      args => args.length match {
        case 1 => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(args.head)
        case 2 => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(args(0), args(1))
        case 3 => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(args(0), args(1), args(2))
        case n => throw new IllegalArgumentException(
          s"bloom_filter_agg expects 1 to 3 arguments " +
            s"(xxhash64(col)[, est_items[, num_bits]]), got $n")
      }),
    ("might_contain",
      "might_contain(bloom_binary, xxhash64(value)) - bloom membership probe",
      args => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(args(0), args(1))))

  /** Register as temp functions on a live session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "scala_udf")
    }

  /** Parameter positions take literals only (they size compiled
    * kernels); a non-foldable argument must fail analysis with a clear
    * message, not NPE at eval. */
  private def constArg(e: Expression): Number = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"graft function parameter must be a constant expression, got: ${e.sql}")
    e.eval(null) match {
      case n: Number => n
      case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
      case null => throw new IllegalArgumentException(
        s"graft function parameter must not be NULL: ${e.sql}")
      case other => throw new IllegalArgumentException(
        s"graft function parameter must be numeric, got ${other.getClass.getSimpleName}: ${e.sql}")
    }
  }
  private def intArg(e: Expression): Int = constArg(e).intValue()
  private def longArg(e: Expression): Long = constArg(e).longValue()
}

/** Builder-time flavor: `SparkSession.builder().withExtensions(new
  * GraftExtensions)` or config `spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, usage, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
          "", "", "", "", "", "", "scala_udf"), b))
    }
}
