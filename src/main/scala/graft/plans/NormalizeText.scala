package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization for corpus preprocessing, fused into one
  * codegen'd pass: Unicode accent strip (NFD decompose, drop combining
  * marks), lowercase, collapse ASCII-whitespace runs to a single space,
  * trim. The equivalent built-in chain is four expressions with two
  * regex engines; this is one call per row inside whole-stage codegen.
  *
  * Semantics contract (the DuckDB oracle spells the identical chain as
  * `trim(regexp_replace(lower(strip_accents(s)), '\s+', ' ', 'g'))`):
  *   - accent strip = NFD + remove Unicode category Mn (utf8proc's
  *     strip_accents does the same decompose-and-drop for Latin text);
  *   - lowercase = `String.toLowerCase(Locale.ROOT)`;
  *   - whitespace = Java regex `\s` class (ASCII), runs → one ' '.
  */
object NormalizeTextExpr {

  def apply(text: Column): Column =
    ExprColumn(NormalizeText(ExprColumn.exprOf(text)))

  private[plans] def eval(s: UTF8String): UTF8String = {
    val str = s.toString
    val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    var pendingSpace = false
    var emitted = false
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) {
        if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
          c == '\f' || c == '\r') {
          pendingSpace = emitted // leading whitespace never emits
        } else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.append(c)
          emitted = true
        }
      }
      i += 1
    }
    UTF8String.fromString(sb.toString.toLowerCase(java.util.Locale.ROOT))
  }
}

case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormalizeTextExpr.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val clz = NormalizeTextExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $clz.eval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}
