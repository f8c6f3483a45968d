package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Product aggregate (reference `product` kernel,
  * cpp/src/arrow/compute/kernels/aggregate_basic.cc) — Spark has no
  * builtin. A DeclarativeAggregate: the update/merge are pure expressions,
  * so it participates in whole-stage codegen and map-side partial
  * aggregation (multiplication is commutative/associative — partials
  * merge exactly for integer-valued doubles).
  *
  * Nulls are skipped; an empty or all-null group yields 1.0 (the
  * multiplicative identity — callers wanting SQL-style NULL can guard with
  * count()).
  */
case class Product(child: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_product"

  private lazy val product = AttributeReference("product", DoubleType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = product :: Nil

  override lazy val initialValues: Seq[Expression] = Literal(1.0) :: Nil

  override lazy val updateExpressions: Seq[Expression] =
    If(IsNull(child), product, product * child.cast(DoubleType)) :: Nil

  override lazy val mergeExpressions: Seq[Expression] =
    (product.left * product.right) :: Nil

  override lazy val evaluateExpression: Expression = product

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Product = copy(child = newChildren.head)
}

object Product {
  def apply(c: Column): Column =
    Bridge.column(Product(Bridge.expression(c)).toAggregateExpression())
}
