package graft.functions

import graft.core.Murmur2
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for the engine's reference-compatible hash:
  * `graft_murmur2(str, seed)` -> BIGINT holding the unsigned 32-bit
  * MurmurHash2 of the string's UTF-8 bytes (identical to the kernel the
  * MinHash signatures are built from; for ASCII input identical to the
  * reference engine's hash of the same bytes). Codegen'd: emits a static
  * call to the shared kernel, so SQL users and the fused signature kernel
  * can never drift apart.
  */
case class Murmur2Expr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_murmur2 expects (string, int), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType

  override def nullSafeEval(str: Any, seed: Any): Any = {
    val bytes = str.asInstanceOf[UTF8String].getBytes
    Murmur2.hashBytes(bytes, seed.asInstanceOf[Int]) & 0xffffffffL
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (str, seed) => {
      val bytes = ctx.freshName("bytes")
      s"""
         |byte[] $bytes = $str.getBytes();
         |${ev.value} = graft.core.Murmur2.hashBytes($bytes, $bytes.length, $seed) & 0xffffffffL;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Murmur2Expr {
  def murmur2(str: Column, seed: Column): Column =
    GraftBridge.column(Murmur2Expr(GraftBridge.expression(str), GraftBridge.expression(seed)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_murmur2", exprs => Murmur2Expr(exprs(0), exprs(1)), "scala_udf")
}
