package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text statistics for the quality-scoring pipeline stage:
  * whitespace-token count, word-token count, distinct word tokens,
  * English-stopword hits, alphabetic-char count, char count — six counts
  * the composed-builtin formulation derives from FOUR separate
  * tokenizations plus two regex passes per row.
  *
  * Semantics replicate the builtin formulas exactly (the DuckDB oracle
  * verifies equality):
  *   - n_tok: 0 for space-trimmed-empty text, else split count on `\s+`
  *     of the space-trimmed text (Spark `trim` strips ONLY ' ');
  *   - word tokens: lowercased split on `[^a-z0-9']+`, empties dropped;
  *   - n_alpha: chars matching `[A-Za-z ]`.
  */
object TextStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_word", IntegerType, nullable = false),
    StructField("n_dist", IntegerType, nullable = false),
    StructField("hits_en", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false)))

  def apply(text: Column, stopwordsEn: Seq[String]): Column =
    ExprColumn(TextStats(ExprColumn.exprOf(text), stopwordsEn))

  private[plans] def eval(
      s: UTF8String, stops: java.util.HashSet[String]): InternalRow = {
    val str = s.toString
    val nChars = str.codePointCount(0, str.length)

    // whitespace tokens of the SPACE-trimmed string (Spark trim == ' ')
    var b = 0
    var e = str.length
    while (b < e && str.charAt(b) == ' ') b += 1
    while (e > b && str.charAt(e - 1) == ' ') e -= 1
    // split("\\s+", -1).length == (number of \s+ runs) + 1 — counted by
    // char scan (a per-row String.split would recompile the pattern and
    // allocate the token array; \s is Java's ASCII class)
    val nTok =
      if (b == e) 0
      else {
        var runs = 0
        var p = b
        var inWs = false
        while (p < e) {
          val ws = isJavaWs(str.charAt(p))
          if (ws && !inWs) runs += 1
          inWs = ws
          p += 1
        }
        runs + 1
      }

    // word tokens: lowercase, split on non [a-z0-9'], drop empties
    val lower = s.toLowerCase.toString // UTF8String casing == Spark lower()
    var nWord = 0
    var hits = 0
    val dist = new java.util.HashSet[String]()
    var i = 0
    val n = lower.length
    while (i <= n) {
      var j = i
      while (j < n && isWordChar(lower.charAt(j))) j += 1
      if (j > i) {
        val tok = lower.substring(i, j)
        nWord += 1
        dist.add(tok)
        if (stops.contains(tok)) hits += 1
        i = j
      }
      i += 1
    }

    var nAlpha = 0
    var k = 0
    while (k < str.length) {
      val c = str.charAt(k)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || c == ' ') nAlpha += 1
      k += 1
    }

    new GenericInternalRow(Array[Any](nTok, nWord, dist.size, hits, nAlpha, nChars))
  }

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '\''

  /** Java regex \s (no UNICODE flag): [ \t\n\x0B\f\r]. */
  private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
}

case class TextStats(child: Expression, stopwordsEn: Seq[String])
  extends UnaryExpression {

  @transient private lazy val stops: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwordsEn.foreach(s.add)
    s
  }

  override def dataType: DataType = TextStatsExpr.schema

  override def nullSafeEval(input: Any): Any =
    TextStatsExpr.eval(input.asInstanceOf[UTF8String], stops)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val clz = TextStatsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val stopsRef = ctx.addReferenceObj("textStatsStops", stops, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $clz.eval($c, $stopsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}
