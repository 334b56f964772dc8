package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** Accent-folding string normalization — the reference's `unidecode`
  * normalize step (fuzzy_search.py:14,49; search_index.py:20) as a native
  * Catalyst expression so it runs inside whole-stage codegen instead of a
  * UDF (SURVEY.md §2.11: one of the few genuine custom-Expression
  * candidates).
  *
  * Semantics: Unicode NFD decomposition, drop combining marks, then map
  * the handful of Latin letters NFD cannot decompose (đ ß æ œ ø ł).
  * Matches DuckDB's strip_accents on Latin-script inputs, which is what
  * makes the search queries oracle-checkable.
  */
case class AccentFold(child: Expression) extends UnaryExpression {
  // Input contract: a string column (AbstractDataType/ExpectsInputTypes
  // are private[sql], so the string requirement is by convention here —
  // analysis still fails on non-string children via the UTF8String cast).
  override def dataType: DataType = child.dataType

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(AccentFolder.fold(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.AccentFolder.fold($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): AccentFold =
    copy(child = newChild)

  override def prettyName: String = "accent_fold"
}

/** JVM-side folding routine shared by interpreted eval and codegen. */
object AccentFolder {
  private val specials: Map[Char, String] = Map(
    'đ' -> "d", 'Đ' -> "D", 'ß' -> "ss", 'ẞ' -> "SS",
    'æ' -> "ae", 'Æ' -> "AE", 'œ' -> "oe", 'Œ' -> "OE",
    'ø' -> "o", 'Ø' -> "O", 'ł' -> "l", 'Ł' -> "L",
    'ð' -> "d", 'Ð' -> "D", 'þ' -> "th", 'Þ' -> "TH")

  def fold(s: String): String = {
    val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(n.length)
    var i = 0
    while (i < n.length) {
      val ch = n.charAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) {
        specials.get(ch) match {
          case Some(rep) => sb.append(rep)
          case None      => sb.append(ch)
        }
      }
      i += 1
    }
    sb.toString
  }
}
