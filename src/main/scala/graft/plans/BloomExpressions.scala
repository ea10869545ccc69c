package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a codegen'd Catalyst expression.
  *
  * Spark builds runtime bloom filters for join pruning internally, but
  * exposes no public expression to test a column against a
  * driver-built [[BloomFilter]] (`df.stat.bloomFilter` returns the
  * sketch and stops there). This wraps one as a first-class expression:
  * the filter ships to executors once as a referenced object inside the
  * generated code (same mechanism Spark uses for its own
  * BloomFilterMightContain), and each row pays one Murmur3 probe —
  * whole-stage-codegen friendly, no UDF serialization.
  *
  * Semantics: no false negatives, `fpp`-bounded false positives —
  * callers that need exactness follow with an exact join on the
  * survivors (see graft.operators.Corpus.bloomDecontaminate).
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  // ExpectsInputTypes is out of reach here (AbstractDataType is
  // private[sql] in Spark 4), so the string requirement is a manual check
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string child, got ${child.dataType.catalogString}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  // mightContainBinary over the UTF-8 bytes == mightContainString
  // (BloomFilterImpl.putString hashes the same byte view) without the
  // UTF8String -> java.lang.String copy per row.
  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** [[BloomMightContain]]'s LONG sibling — probes a filter built over a
  * BIGINT column (`stat.bloomFilter` on longs uses `putLong`, whose
  * hash differs from the string/binary path, so the probe must match).
  * One `mightContainLong` per row, codegen'd.
  */
case class BloomMightContainLong(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint child, got ${child.dataType.catalogString}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain_long"

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomL", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomExpressions {
  /** Column form: true iff `c` might be in `filter`. */
  def mightContain(c: Column, filter: BloomFilter): Column =
    ExprColumn(BloomMightContain(ExprColumn.exprOf(c), filter))

  /** Long-column form — for filters built over BIGINT keys. */
  def mightContainLong(c: Column, filter: BloomFilter): Column =
    ExprColumn(BloomMightContainLong(ExprColumn.exprOf(c), filter))
}
