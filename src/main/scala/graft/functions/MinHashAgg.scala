package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed [[Aggregator]] that UNIONS MinHash signatures (element-wise
  * minimum) across a group — yielding the signature of the union of the
  * group's shingle sets, by the MinHash property
  * `sig(A ∪ B) = elementwise-min(sig(A), sig(B))`.
  *
  * Use case: cluster-level signatures — after near-dup clustering,
  * aggregate one signature per cluster and compare CLUSTERS cheaply
  * (the second dedup tier at crawl scale). Partial aggregation applies:
  * buffers merge map-side, so the shuffle carries one signature per
  * (partition × group), not per row.
  */
object MinHashAgg {

  final class SigUnion(numPerms: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

    override def zero: Array[Long] = Array.fill(numPerms)(Long.MaxValue)

    override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
      if (sig == null) return buf // null signature (null text) → skip row
      // a length mismatch means a wrong numPerms, not dirty data: the
      // silent alternative leaves Long.MaxValue sentinels that spuriously
      // "agree" between clusters and inflate estimated similarity
      require(sig.length == buf.length,
        s"signature length ${sig.length} != numPerms ${buf.length}")
      var i = 0
      while (i < buf.length) {
        if (sig(i) < buf(i)) buf(i) = sig(i)
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        if (b(i) < a(i)) a(i) = b(i)
        i += 1
      }
      a
    }

    override def finish(buf: Array[Long]): Seq[Long] = buf.toIndexedSeq

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Untyped-column form:
    * `df.groupBy("cluster").agg(MinHashAgg.sigUnion(col("sig")))`.
    */
  def sigUnion(sig: Column, numPerms: Int = 64): Column =
    udaf(new SigUnion(numPerms), ExpressionEncoder[Seq[Long]]())
      .apply(sig)
      .as("sig_union")
}
