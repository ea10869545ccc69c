package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding expressions (Sennrich, Haddow & Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016) —
  * the two per-row kernels of [[graft.operators.Corpus.bpeTrain]] /
  * `bpeEncode`:
  *
  *  - [[BpeMergePair]]: apply ONE learned merge to a symbol array
  *    (left-to-right, non-overlapping — the reference algorithm's
  *    merge application), used inside the training loop;
  *  - [[BpeEncode]]: segment text with a full ranked merge table
  *    (greedy lowest-rank-first per word — exactly how trained BPE
  *    vocabularies are applied), used for encoding and token counts.
  *
  * Both are codegen'd static-call expressions (the [[TextStats]]
  * posture): interpreted higher-order functions could express the
  * merge scan only as a fold re-evaluated per consumer, and the
  * encode loop not at all.
  */
object BpeExpressions {

  def mergePair(syms: Column, left: String, right: String): Column =
    ExprColumn(BpeMergePair(ExprColumn.exprOf(syms), left, right))

  /** `merges` ordered by rank (first = learned first = lowest rank). */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    ExprColumn(BpeEncode(ExprColumn.exprOf(text), merges))

  private[plans] def applyMerge(
      syms: ArrayData, left: UTF8String, right: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && left.equals(syms.getUTF8String(i)) &&
          right.equals(syms.getUTF8String(i + 1))) {
        out.add(UTF8String.concat(left, right))
        i += 2
      } else {
        out.add(syms.getUTF8String(i))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '\''

  /** Greedy BPE segmentation of one word (chars + `</w>` marker):
    * repeatedly merge the present pair with the LOWEST rank until no
    * adjacent pair remains in the table — the reference apply
    * algorithm.
    */
  private[plans] def encodeWord(
      word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms = new Array[String](word.length + 1)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    syms(word.length) = "</w>"
    var done = false
    while (!done && syms.length >= 2) {
      var best = -1
      var bestRank = Integer.MAX_VALUE
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.get(syms(j) + " " + syms(j + 1))
        if (r != null && r < bestRank) { bestRank = r; best = j }
        j += 1
      }
      if (best < 0) done = true
      else {
        // merge ALL occurrences of the chosen pair, left to right
        val l = syms(best)
        val r = syms(best + 1)
        val out = new java.util.ArrayList[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k + 1 < syms.length && syms(k) == l && syms(k + 1) == r) {
            out.add(l + r); k += 2
          } else { out.add(syms(k)); k += 1 }
        }
        syms = out.toArray(new Array[String](out.size()))
      }
    }
    syms
  }

  private[plans] def encodeText(
      s: UTF8String, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    // identical word tokenization to TextFunctions.tokens: lowercase,
    // maximal [a-z0-9'] runs
    val lower = s.toLowerCase.toString
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val n = lower.length
    while (i <= n) {
      var j = i
      while (j < n && isWordChar(lower.charAt(j))) j += 1
      if (j > i) {
        val toks = encodeWord(lower.substring(i, j), ranks)
        var k = 0
        while (k < toks.length) {
          out.add(UTF8String.fromString(toks(k))); k += 1
        }
        i = j
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Pair key = "left right" — the space separator cannot occur inside
    * a symbol (symbols are [a-z0-9'] runs and `</w>` concatenations),
    * so ("a","bc") and ("ab","c") never collide.
    */
  private[plans] def ranksOf(
      merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.put(l + " " + r, Integer.valueOf(i))
    }
    m
  }
}

/** One BPE merge step over a symbol array — `(left, right) → leftright`
  * left-to-right non-overlapping.
  */
case class BpeMergePair(child: Expression, left: String, right: String)
  extends UnaryExpression {

  @transient private lazy val l = UTF8String.fromString(left)
  @transient private lazy val r = UTF8String.fromString(right)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BpeExpressions.applyMerge(input.asInstanceOf[ArrayData], l, r)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val clz = BpeExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val lRef = ctx.addReferenceObj("bpeLeft", l, classOf[UTF8String].getName)
    val rRef = ctx.addReferenceObj("bpeRight", r, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $clz.applyMerge($c, $lRef, $rRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergePair =
    copy(child = newChild)
}

/** Full BPE segmentation of text with a ranked merge table. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  @transient private lazy val ranks = BpeExpressions.ranksOf(merges)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BpeExpressions.encodeText(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val clz = BpeExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $clz.encodeText($c, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
