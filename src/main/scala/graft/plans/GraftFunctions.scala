package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** SQL-surface registration for the custom Catalyst expressions, so the
  * engine's operators are reachable from `spark.sql(...)` as well as the
  * Column API:
  *
  *   - `graft_minhash(shingles_array[, numPerms])` → array<long>
  *   - `graft_minhash_bands(text[, shingleLen, numPerms, bands])` → array<long>
  *   - `graft_simhash(tokens_array)` → long
  *   - `graft_shingle_hashes(text[, n])` → sorted array<long>
  *   - `graft_ngram_hashes(tokens_array[, n])` → sorted array<long>
  *   - `graft_jaccard(sorted_a, sorted_b)` → double
  *
  * Two injection paths: [[GraftExtensions]] for
  * `spark.sql.extensions`-configured sessions (the
  * SparkSessionExtensions route), and [[GraftFunctions.register]] for an
  * already-built session (temp-function registry).
  */
object GraftFunctions {

  /** The fused vector loops read array<double>; SQL callers may pass
    * array<float> — same widening cast the Column helpers apply.
    */
  private def asDoubles(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** name → (builder, usage) */
  val builders: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("graft_minhash", exprs => exprs match {
      case Seq(c) => MinHashSignature(c, 64)
      case Seq(c, n) => MinHashSignature(c, intArg(n, "numPerms"))
      case _ => throw new IllegalArgumentException("graft_minhash(shingles[, numPerms])")
    }, "graft_minhash(shingles_array[, numPerms]) - MinHash signature"),
    ("graft_minhash_bands", exprs => exprs match {
      case Seq(c) => MinHashBands(c, 5, 64, 8)
      case Seq(c, sl, np, b) =>
        MinHashBands(c, intArg(sl, "shingleLen"), intArg(np, "numPerms"), intArg(b, "bands"))
      case _ => throw new IllegalArgumentException(
        "graft_minhash_bands(text[, shingleLen, numPerms, bands])")
    }, "graft_minhash_bands(text[, shingleLen, numPerms, bands]) - LSH band hashes"),
    ("graft_simhash", exprs => exprs match {
      case Seq(c) => SimHash64(c)
      case _ => throw new IllegalArgumentException("graft_simhash(tokens_array)")
    }, "graft_simhash(tokens_array) - 64-bit SimHash fingerprint"),
    ("graft_shingle_hashes", exprs => exprs match {
      case Seq(c) => ShingleHashes(c, 5)
      case Seq(c, n) => ShingleHashes(c, intArg(n, "n"))
      case _ => throw new IllegalArgumentException("graft_shingle_hashes(text[, n])")
    }, "graft_shingle_hashes(text[, n]) - sorted hashed shingle set"),
    ("graft_ngram_hashes", exprs => exprs match {
      case Seq(c) => NgramHashes(c, 3)
      case Seq(c, n) => NgramHashes(c, intArg(n, "n"))
      case _ => throw new IllegalArgumentException("graft_ngram_hashes(tokens[, n])")
    }, "graft_ngram_hashes(tokens_array[, n]) - sorted hashed word-ngram set"),
    ("graft_jaccard", exprs => exprs match {
      case Seq(a, b) => SortedLongJaccard(a, b)
      case _ => throw new IllegalArgumentException("graft_jaccard(sorted_a, sorted_b)")
    }, "graft_jaccard(sorted_a, sorted_b) - exact Jaccard of sorted long arrays"),
    ("graft_simhash_text", exprs => exprs match {
      case Seq(c) => SimHash64Str(c)
      case _ => throw new IllegalArgumentException("graft_simhash_text(text)")
    }, "graft_simhash_text(text) - fused tokenize+SimHash fingerprint"),
    ("graft_minhash_text", exprs => exprs match {
      case Seq(c) => MinHashSignatureStr(c, 5, 64)
      case Seq(c, sl, np) =>
        MinHashSignatureStr(c, intArg(sl, "shingleLen"), intArg(np, "numPerms"))
      case _ => throw new IllegalArgumentException(
        "graft_minhash_text(text[, shingleLen, numPerms])")
    }, "graft_minhash_text(text[, shingleLen, numPerms]) - fused shingle+MinHash signature"),
    ("graft_dot", exprs => exprs match {
      case Seq(a, b) => DotProduct(asDoubles(a), asDoubles(b))
      case _ => throw new IllegalArgumentException("graft_dot(vec_a, vec_b)")
    }, "graft_dot(vec_a, vec_b) - sequential-double dot product"),
    ("graft_srp", exprs => exprs match {
      case Seq(c) => SrpSig(asDoubles(c), 16)
      case Seq(c, b) => SrpSig(asDoubles(c), intArg(b, "bits"))
      case _ => throw new IllegalArgumentException("graft_srp(vec[, bits])")
    }, "graft_srp(vec[, bits]) - sign-random-projection LSH signature"),
    ("graft_srp_multi", exprs => exprs match {
      case Seq(c, b, t) => SrpSigMulti(asDoubles(c), intArg(b, "bits"), intArg(t, "tables"))
      case _ => throw new IllegalArgumentException("graft_srp_multi(vec, bits, tables)")
    }, "graft_srp_multi(vec, bits, tables) - multi-table SRP signatures"),
    ("graft_normalize_text", exprs => exprs match {
      case Seq(c) => NormalizeText(c)
      case _ => throw new IllegalArgumentException("graft_normalize_text(text)")
    }, "graft_normalize_text(text) - fused lower+accent-strip+whitespace-collapse"))
  // Note: TextFunctions.chunks is NOT registered here — it is a pure
  // built-in composition (split/slice/transform) that SQL callers can
  // write directly; the registry is reserved for the custom Catalyst
  // expressions SQL cannot otherwise reach. (A Column-layer round-trip
  // through the registry leaves unresolved ColumnNode expressions in
  // the plan — tried and rejected.)

  /** Register on an existing session (temp functions). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder, _) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` injection point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder, usage) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.plans.HashExpressions", null, name, usage, ""),
        builder))
    }
}
