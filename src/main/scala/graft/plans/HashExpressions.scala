package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the dedup/similarity operators —
  * chosen over UDFs per the preference order (compose built-ins > custom
  * Expression > custom plan > mapPartitions): a MinHash signature needs
  * `numPerms` hash evaluations per shingle, which as built-ins would be
  * `numPerms` separate array traversals and as a UDF would break codegen
  * and pay serialization. One expression computes the whole signature in
  * a single pass over the shingle array.
  *
  * All hashing uses Spark's own Murmur3_x86_32 (public `unsafe` util —
  * the same primitive behind `functions.hash`), with the standard
  * `h_i(x) = a_i * h(x) + b_i mod p` family of universal permutations
  * (MMDS ch.3 construction).
  */
object HashExpressions {

  private[plans] val MersennePrime = (1L << 61) - 1

  /** Deterministic per-permutation coefficients (splitmix64 over the
    * permutation index — fixed seed, reproducible across runs/sessions).
    */
  private[plans] def coeffs(numPerms: Int): (Array[Long], Array[Long]) = {
    def splitmix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    val a = new Array[Long](numPerms)
    val b = new Array[Long](numPerms)
    var i = 0
    while (i < numPerms) {
      a(i) = (splitmix(i.toLong * 2 + 1).abs % (MersennePrime - 1)) + 1
      b(i) = splitmix(i.toLong * 2 + 2).abs % MersennePrime
      i += 1
    }
    (a, b)
  }

  private[plans] def baseHash(s: UTF8String): Long =
    Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, 42) & 0xffffffffL

  /** Evaluate a full MinHash signature in one pass over the shingles. */
  private[plans] def minhash(arr: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val n = a.length
    val sig = Array.fill[Long](n)(Long.MaxValue)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val h = baseHash(arr.getUTF8String(j))
        var i = 0
        while (i < n) {
          // (a*h + b) mod p via 128-bit-free math: p = 2^61-1 allows
          // mod-mul with Math.multiplyHigh folding.
          val v = mulMod(a(i), h, b(i))
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** (a*h + b) mod (2^61-1), using multiplyHigh to avoid overflow. */
  private[plans] def mulMod(a: Long, h: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, h)
    val lo = a * h
    // fold 128-bit value mod 2^61-1: x = hi*2^64 + lo;
    // 2^64 ≡ 8 (mod 2^61-1)
    var r = (lo & MersennePrime) + (lo >>> 61) + hi * 8
    r = (r & MersennePrime) + (r >>> 61)
    r = (r & MersennePrime) + (r >>> 61)
    val s = r + b
    if (s >= MersennePrime) s - MersennePrime else s
  }

  /** 64-bit SimHash over a token array: per-token murmur-derived 64-bit
    * hash votes ±1 on each bit; the fingerprint is the sign vector.
    */
  private[plans] def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h1 = Murmur3_x86_32.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42).toLong
        val h2 = Murmur3_x86_32.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 1042).toLong
        val h = (h1 << 32) | (h2 & 0xffffffffL)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  def minhashSignature(shingles: Column, numPerms: Int = 64): Column =
    ExprColumn(MinHashSignature(ExprColumn.exprOf(shingles), numPerms))

  def simHash64(tokens: Column): Column =
    ExprColumn(SimHash64(ExprColumn.exprOf(tokens)))
}

/** MinHash signature: array<string> shingles → array<long> of length
  * `numPerms`. Whole-signature in one pass; codegen via static helper
  * call (the loop body is branch-heavy, so generated code just invokes
  * the same JVM helper — still inside WholeStageCodegen, no fallback to
  * interpreted projection).
  */
case class MinHashSignature(child: Expression, numPerms: Int)
  extends UnaryExpression {

  @transient private lazy val (a, b) = HashExpressions.coeffs(numPerms)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashExpressions.minhash(input.asInstanceOf[ArrayData], a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val clz = HashExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val coeffsA = ctx.addReferenceObj("minhashA", a, "long[]")
    val coeffsB = ctx.addReferenceObj("minhashB", b, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $clz.minhash($c, $coeffsA, $coeffsB);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** SimHash-64 fingerprint: array<string> tokens → long. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HashExpressions.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val clz = HashExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $clz.simhash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
