package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Presto's REGEXP_REPLACE / REGEXP_EXTRACT replacement semantics,
  * which are java.util.regex Matcher semantics (the reference's JONI
  * engine mirrors them for this surface — JoniRegexpFunctions.java
  * regexpReplace/regexpExtract):
  *
  *   - `${name}` named-group references in the replacement resolve to
  *     the group's capture (AbstractTestRegexpFunctions pins
  *     `regexp_replace('wxyz', '(?<xyz>[xyz])', '${xyz}${xyz}')` →
  *     `wxxyyzz`); Spark's RegExpReplace parses `$` references itself
  *     and resolves every named reference to the empty string.
  *   - a group that did not PARTICIPATE in the match substitutes the
  *     empty string (`'(?<w>w)|(?<xyz>[xyz])'` → `[w]()` on the first
  *     match), and regexp_extract of such a group is NULL where
  *     Spark's RegExpExtract returns ''.
  *
  * Codegen is a static call, so both stay inside whole-stage codegen;
  * the compiled Pattern is memoized per thread on the pattern text
  * (patterns are almost always per-query constants). */
object PrestoRegexp {
  private val lastPattern =
    new ThreadLocal[java.util.regex.Pattern]()

  private def pattern(p: UTF8String): java.util.regex.Pattern = {
    val cached = lastPattern.get()
    val s = p.toString
    if (cached != null && cached.pattern() == s) cached
    else {
      val compiled = java.util.regex.Pattern.compile(s)
      lastPattern.set(compiled)
      compiled
    }
  }

  def replace(src: UTF8String, p: UTF8String, rep: UTF8String): UTF8String =
    UTF8String.fromString(
      pattern(p).matcher(src.toString).replaceAll(rep.toString))

  def extract(src: UTF8String, p: UTF8String, group: Int): UTF8String = {
    val m = pattern(p).matcher(src.toString)
    if (group < 0 || group > m.groupCount)
      throw new IllegalArgumentException(
        s"Pattern has ${m.groupCount} groups. Cannot access group $group")
    if (!m.find()) null
    else {
      val g = m.group(group)
      if (g == null) null else UTF8String.fromString(g)
    }
  }
}

/** regexp_replace(string, pattern, replacement) with the reference's
  * `$g` / `${name}` replacement grammar (see [[PrestoRegexp]]). */
case class PrestoRegexpReplace(
    first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(s: Any, p: Any, r: Any): Any =
    PrestoRegexp.replace(s.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, p, r) =>
      s"graft.functions.PrestoRegexp.replace($s, $p, $r)")

  override def prettyName: String = "regexp_replace"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PrestoRegexpReplace =
    copy(first = f, second = s, third = t)
}

/** regexp_extract(string, pattern[, group]) returning NULL for a
  * missing match OR a non-participating group (see [[PrestoRegexp]]). */
case class PrestoRegexpExtract(
    first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def nullSafeEval(s: Any, p: Any, g: Any): Any =
    PrestoRegexp.extract(s.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String], g.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p, g) =>
      s"""${ev.value} = graft.functions.PrestoRegexp.extract($s, $p, $g);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)

  override def prettyName: String = "regexp_extract"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PrestoRegexpExtract =
    copy(first = f, second = s, third = t)
}
