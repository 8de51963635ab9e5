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
    split(predicate).map {
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
      case In(a: AttributeReference, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        InShape(a.name, vs.map(_.asInstanceOf[Literal].value))
      case InSet(a: AttributeReference, vs) => InShape(a.name, vs.toSeq)
      case _ => OpaqueShape
    }
  }

  def conjunctShapes(predicate: Column): Seq[PredShape] = {
    import org.apache.spark.sql.internal.{ColumnNode, Literal => ULit,
      UnresolvedAttribute => UAttr, UnresolvedFunction => UFn}
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
    split(predicate.node).map {
      case f: UFn => (f.functionName, f.arguments) match {
        case ("isNull", Seq(a: UAttr)) => NullShape(a.nameParts.mkString("."), isNull = true)
        case ("isNotNull", Seq(a: UAttr)) => NullShape(a.nameParts.mkString("."), isNull = false)
        case (op @ (">" | ">=" | "<" | "<=" | "=" | "=="), Seq(a: UAttr, l: ULit)) =>
          CmpShape(a.nameParts.mkString("."), op, l.value)
        case (op @ (">" | ">=" | "<" | "<=" | "=" | "=="), Seq(l: ULit, a: UAttr)) =>
          CmpShape(a.nameParts.mkString("."), flip(op), l.value)
        case ("in", (a: UAttr) +: rest)
            if rest.nonEmpty && rest.forall(_.isInstanceOf[ULit]) =>
          InShape(a.nameParts.mkString("."),
            rest.map(_.asInstanceOf[ULit].value))
        case _ => OpaqueShape
      }
      case _ => OpaqueShape
    }
  }
}
