package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** HASH_CODE(str) — Java String.hashCode semantics.
  *
  * Reference: `FlinkSqlOperatorTable.java:393` (HASH_CODE); runtime
  * `SqlFunctionUtils.java` delegates to String.hashCode.
  *
  * Implemented as a native Catalyst expression with codegen (not a UDF)
  * so it stays inside whole-stage codegen in hot paths.
  */
case class HashCode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    v.asInstanceOf[UTF8String].toString.hashCode
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"($c).toString().hashCode()")
  override protected def withNewChildInternal(c: Expression): HashCode = copy(c)
  override def prettyName: String = "hash_code"
}
