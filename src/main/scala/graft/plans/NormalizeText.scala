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
  *   - lowercase = `String.toLowerCase(Locale.ROOT)`, applied BEFORE
  *     the mark-drop pass: Java's full case mappings can themselves
  *     emit combining marks (composed 'İ' U+0130 → 'i' + U+0307), and
  *     utf8proc's simple 1:1 mapping never does — lowering first
  *     guarantees any such mark dies in the same strip pass instead of
  *     leaking into the output;
  *   - whitespace = RE2's ASCII `\s` class `[\t\n\f\r ]` (what the
  *     oracle's regexp_replace matches), runs → one ' '. Deliberately
  *     NOT Java's `\s`: Java adds vertical tab U+000B, which the
  *     oracle chain passes through untouched — so do we.
  */
object NormalizeTextExpr {

  def apply(text: Column): Column =
    ExprColumn(NormalizeText(ExprColumn.exprOf(text)))

  private[plans] def eval(s: UTF8String): UTF8String = {
    val lowered = s.toString.toLowerCase(java.util.Locale.ROOT)
    val nfd = Normalizer.normalize(lowered, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    var pendingSpace = false
    var emitted = false
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) {
        if (c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r') {
          pendingSpace = emitted // leading whitespace never emits
        } else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.append(c)
          emitted = true
        }
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
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
