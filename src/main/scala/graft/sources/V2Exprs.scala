package graft.sources

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.{expressions => ce}
import org.apache.spark.sql.catalyst.expressions.V2ExpressionUtils
import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, GeneralScalarExpression, NamedReference}

/** V2 connector expression → Catalyst, extending Spark's own
  * [[V2ExpressionUtils.toCatalyst]] with the COMMON STRING FUNCTIONS it
  * has no mapping for in Spark 4.1 (SUBSTRING / UPPER / LOWER / TRIM
  * variants — VERDICT r9 "What's missing #4"). Without these, a
  * predicate like `substring(name, 1, 2) = 'ab'` is unclaimable and
  * stays a post-scan Filter ABOVE the DSv2 boundary; with them it is
  * claimed and evaluates fused inside the snapshot plan like every other
  * expression predicate.
  *
  * Structure-recursive: each node this object knows (the string
  * functions plus the logical/comparison glue predicates they appear
  * under) converts directly; any OTHER node delegates its whole subtree
  * to Spark's translator — so everything Spark supports today keeps
  * working, and future Spark additions are picked up automatically. */
private[sources] object GraftV2Exprs {

  def toCatalyst(e: V2Expr): Option[ce.Expression] = e match {
    case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
      Some(ce.Literal(l.value, l.dataType))
    case r: NamedReference =>
      Some(UnresolvedAttribute(r.fieldNames.toSeq))
    case g: GeneralScalarExpression =>
      def kids: Option[Seq[ce.Expression]] = {
        val cs = g.children().toSeq.map(toCatalyst)
        if (cs.forall(_.isDefined)) Some(cs.map(_.get)) else None
      }
      def unary(f: ce.Expression => ce.Expression) =
        kids.collect { case Seq(a) => f(a) }
      def binary(f: (ce.Expression, ce.Expression) => ce.Expression) =
        kids.collect { case Seq(a, b) => f(a, b) }
      g.name() match {
        // ---- the r10 string-function additions -----------------------
        case "SUBSTRING" => kids.collect {
          case Seq(str, pos) => ce.Substring(str, pos,
            ce.Literal(Integer.MAX_VALUE))
          case Seq(str, pos, len) => ce.Substring(str, pos, len)
        }
        case "UPPER" => unary(ce.Upper(_))
        case "LOWER" => unary(ce.Lower(_))
        case "TRIM" => kids.collect {
          case Seq(str) => ce.StringTrim(str)
          case Seq(str, chars) => ce.StringTrim(str, chars)
        }
        case "LTRIM" => kids.collect {
          case Seq(str) => ce.StringTrimLeft(str)
          case Seq(str, chars) => ce.StringTrimLeft(str, chars)
        }
        case "RTRIM" => kids.collect {
          case Seq(str) => ce.StringTrimRight(str)
          case Seq(str, chars) => ce.StringTrimRight(str, chars)
        }
        // ---- glue these predicates appear under ----------------------
        case "=" => binary(ce.EqualTo(_, _))
        case "<=>" => binary(ce.EqualNullSafe(_, _))
        case "<>" | "!=" => binary((a, b) => ce.Not(ce.EqualTo(a, b)))
        case ">" => binary(ce.GreaterThan(_, _))
        case ">=" => binary(ce.GreaterThanOrEqual(_, _))
        case "<" => binary(ce.LessThan(_, _))
        case "<=" => binary(ce.LessThanOrEqual(_, _))
        case "AND" => binary(ce.And(_, _))
        case "OR" => binary(ce.Or(_, _))
        case "NOT" => unary(ce.Not(_))
        case "IS_NULL" => unary(ce.IsNull(_))
        case "IS_NOT_NULL" => unary(ce.IsNotNull(_))
        case "STARTS_WITH" => binary(ce.StartsWith(_, _))
        case "ENDS_WITH" => binary(ce.EndsWith(_, _))
        case "CONTAINS" => binary(ce.Contains(_, _))
        case "IN" => kids.collect {
          case cs if cs.size >= 2 => ce.In(cs.head, cs.tail)
        }
        // anything else: Spark's own translator owns the subtree
        case _ => V2ExpressionUtils.toCatalyst(e)
      }
    case other => V2ExpressionUtils.toCatalyst(other)
  }
}
