package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column↔Expression conversions so
  * graft's custom Catalyst expressions (e.g.
  * [[graft.functions.AvroDecode]]) can surface as `Column`s. Spark 4
  * routes Column through ColumnNode; `classic.ExpressionUtils` is the
  * supported conversion but is package-private.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** The Column's API-side node tree (internal.ColumnNode) — what a
    * Column built by `col`/`lit`/operators actually carries in Spark 4
    * before analysis; pattern-matchable without a plan.
    */
  def node(c: Column): internal.ColumnNode = c.node

  /** Normalized conjunct shapes of a predicate Column, for stat-based
    * file pruning ([[graft.core.TxTable.scan]]): the AND tree is
    * flattened and each conjunct classified as `col op literal`
    * (orientation normalized to attribute-first), a null check, or
    * Opaque (anything a stats range cannot reason about). Lives here
    * because Spark 4's ColumnNode classes are private[sql].
    */
  sealed trait PredShape
  case class CmpShape(name: String, op: String, value: Any) extends PredShape
  case class NullShape(name: String, isNull: Boolean) extends PredShape
  /** `col.isin(v1, v2, ...)` — literal values only. */
  case class InShape(name: String, values: Seq[Any]) extends PredShape
  /** A disjunction, each branch its own conjunct list: a file is
    * provably empty for the OR iff EVERY branch is provably empty —
    * so `day = a OR day = b` still skips (Delta/Iceberg-style
    * disjunctive skipping) instead of degrading to Opaque. Branches
    * nest (an OR under an AND under an OR classifies recursively).
    */
  case class OrShape(branches: Seq[Seq[PredShape]]) extends PredShape
  /** `col.startsWith(prefix)` / `LIKE 'prefix%'` (the optimizer
    * rewrites the latter to StartsWith): prunable on string min/max —
    * a file is empty iff its range, truncated to the prefix length in
    * UNSIGNED UTF-8 byte order, lies entirely before or after it.
    */
  case class PrefixShape(name: String, prefix: String) extends PredShape
  case object OpaqueShape extends PredShape

  /** The same classification over a RESOLVED Catalyst predicate — what
    * an optimizer rule sees after pushdown ([[graft.plans.TxSkipRule]]).
    * Literal values here are catalyst-internal (UTF8String, Decimal,
    * epoch-micros longs for timestamps, epoch-days ints for dates) —
    * exactly the units the manifest stats are normalized to.
    */
  def conjunctShapesCatalyst(predicate: catalyst.expressions.Expression): Seq[PredShape] = {
    import org.apache.spark.sql.catalyst.expressions._
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case o => Seq(o)
    }
    def splitOr(e: Expression): Seq[Expression] = e match {
      case Or(l, r) => splitOr(l) ++ splitOr(r)
      case o => Seq(o)
    }
    def shape(e: Expression): PredShape = e match {
      case IsNull(a: AttributeReference) => NullShape(a.name, isNull = true)
      case IsNotNull(a: AttributeReference) => NullShape(a.name, isNull = false)
      case GreaterThan(a: AttributeReference, Literal(v, _)) => CmpShape(a.name, ">", v)
      case GreaterThan(Literal(v, _), a: AttributeReference) => CmpShape(a.name, "<", v)
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => CmpShape(a.name, ">=", v)
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => CmpShape(a.name, "<=", v)
      case LessThan(a: AttributeReference, Literal(v, _)) => CmpShape(a.name, "<", v)
      case LessThan(Literal(v, _), a: AttributeReference) => CmpShape(a.name, ">", v)
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => CmpShape(a.name, "<=", v)
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) => CmpShape(a.name, ">=", v)
      case EqualTo(a: AttributeReference, Literal(v, _)) => CmpShape(a.name, "=", v)
      case EqualTo(Literal(v, _), a: AttributeReference) => CmpShape(a.name, "=", v)
      // null-safe equality (the keyed-verb / CDC dead-key predicate
      // form): against a non-null literal it matches exactly like `=`
      // (a NULL column value compares false, and `=`-pruning never
      // uses null counts); against NULL it IS the null check
      case EqualNullSafe(a: AttributeReference, Literal(v, _)) =>
        if (v == null) NullShape(a.name, isNull = true) else CmpShape(a.name, "=", v)
      case EqualNullSafe(Literal(v, _), a: AttributeReference) =>
        if (v == null) NullShape(a.name, isNull = true) else CmpShape(a.name, "=", v)
      case In(a: AttributeReference, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        InShape(a.name, vs.map(_.asInstanceOf[Literal].value))
      case InSet(a: AttributeReference, vs) => InShape(a.name, vs.toSeq)
      case StartsWith(a: AttributeReference, Literal(v, _)) if v != null =>
        PrefixShape(a.name, v.toString)
      case o @ Or(_, _) => OrShape(splitOr(o).map(b => split(b).map(shape)))
      case _ => OpaqueShape
    }
    split(predicate).map(shape)
  }

  def conjunctShapes(predicate: Column): Seq[PredShape] = {
    import org.apache.spark.sql.internal.{ColumnNode, Literal => ULit,
      SqlExpression => USql, UnresolvedAttribute => UAttr,
      UnresolvedFunction => UFn}
    def split(n: ColumnNode): Seq[ColumnNode] = n match {
      case f: UFn if f.functionName == "and" => f.arguments.flatMap(split)
      case other => Seq(other)
    }
    def flip(op: String): String = op match {
      case ">" => "<"
      case ">=" => "<="
      case "<" => ">"
      case "<=" => ">="
      case other => other // "=" is symmetric
    }
    def splitOr(n: ColumnNode): Seq[ColumnNode] = n match {
      case f: UFn if f.functionName == "or" => f.arguments.flatMap(splitOr)
      case other => Seq(other)
    }
    def shape(n: ColumnNode): PredShape = n match {
      case f: UFn => (f.functionName, f.arguments) match {
        case ("isNull", Seq(a: UAttr)) => NullShape(a.nameParts.mkString("."), isNull = true)
        case ("isNotNull", Seq(a: UAttr)) => NullShape(a.nameParts.mkString("."), isNull = false)
        case (op @ (">" | ">=" | "<" | "<=" | "=" | "=="), Seq(a: UAttr, l: ULit)) =>
          CmpShape(a.nameParts.mkString("."), op, l.value)
        case (op @ (">" | ">=" | "<" | "<=" | "=" | "=="), Seq(l: ULit, a: UAttr)) =>
          CmpShape(a.nameParts.mkString("."), flip(op), l.value)
        // Column `<=>`: like `=` against a non-null literal, the null
        // check against NULL (see the Catalyst twin above)
        case ("<=>" | "eqNullSafe", Seq(a: UAttr, l: ULit)) =>
          if (l.value == null) NullShape(a.nameParts.mkString("."), isNull = true)
          else CmpShape(a.nameParts.mkString("."), "=", l.value)
        case ("<=>" | "eqNullSafe", Seq(l: ULit, a: UAttr)) =>
          if (l.value == null) NullShape(a.nameParts.mkString("."), isNull = true)
          else CmpShape(a.nameParts.mkString("."), "=", l.value)
        case ("in", (a: UAttr) +: rest)
            if rest.nonEmpty && rest.forall(_.isInstanceOf[ULit]) =>
          InShape(a.nameParts.mkString("."),
            rest.map(_.asInstanceOf[ULit].value))
        case ("startswith", Seq(a: UAttr, l: ULit)) if l.value != null =>
          PrefixShape(a.nameParts.mkString("."), l.value.toString)
        case ("or", _) => OrShape(splitOr(f).map(b => split(b).map(shape)))
        case _ => OpaqueShape
      }
      // expr("day = 7") / a procedure's `where` string carries raw SQL
      // TEXT, not an operator tree — without this case every SQL-text
      // predicate classified Opaque and silently lost file skipping
      // (compact(where) would quietly rewrite the whole table)
      case s: USql => sqlTextShapes(s.expression) match {
        case Seq(one) => one
        // a conjunction under an OR branch: a single-branch OrShape IS
        // a conjunct list to the pruner (empty iff any conjunct proves it)
        case many => OrShape(Seq(many))
      }
      case _ => OpaqueShape
    }
    predicate.node match {
      // the whole predicate is SQL text: classify each top conjunct
      case s: USql => sqlTextShapes(s.expression)
      case n => split(n).map(shape)
    }
  }

  /** Classify a raw SQL predicate string by parsing it (unresolved)
    * and walking the catalyst tree: attributes are pinned to
    * name-only references — stat pruning needs just names and literal
    * values, and [[graft.core.TxTable.literalJ]] already speaks the
    * parser's internal literal encodings (UTF8String, epoch days/
    * micros). Unparseable text degrades to Opaque (prune nothing),
    * never throws.
    */
  private def sqlTextShapes(sql: String): Seq[PredShape] =
    try {
      val parsed = catalyst.parser.CatalystSqlParser.parseExpression(sql)
        .transformUp {
          case u: catalyst.analysis.UnresolvedAttribute =>
            catalyst.expressions.AttributeReference(
              u.nameParts.mkString("."), types.NullType)()
        }
      conjunctShapesCatalyst(parsed)
    } catch { case scala.util.control.NonFatal(_) => Seq(OpaqueShape) }
}
