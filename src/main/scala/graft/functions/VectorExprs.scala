package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen'd dot product over two array<double> columns.
  *
  * Why a custom Catalyst Expression: Spark's higher-order builtins
  * (`aggregate(zip_with(a, b, (x,y) -> x*y), ...)`) evaluate their lambdas
  * INTERPRETED, one boxed element at a time — measured ~50x slower than a
  * fused loop when reranking millions of ANN candidate pairs. This
  * expression emits a tight primitive loop into whole-stage codegen.
  *
  * Semantics match the ordered left-fold exactly (sequential IEEE double
  * adds, index 0..n-1), so results stay bit-identical to the
  * `aggregate(zip_with(...))` formulation and to the DuckDB oracle's
  * `list_dot_product`. Null arrays or length mismatch -> null.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd positional-agreement count over two array<int> columns — the
  * MinHash signature-similarity numerator (reference signature_similarity,
  * /root/reference/src/MPI/utils.c:79-87). Same why as DotProductD: the
  * `aggregate(zip_with(...))` formulation evaluates its lambdas INTERPRETED
  * per element, in the per-candidate-pair hot path. Null arrays or length
  * mismatch -> null; the count is exactly `sum(1 for i where a[i]==b[i])`.
  */
case class ArrayAgreeI(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _                         => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_agree expects (array<int>, array<int>), got (${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_agree"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var acc = 0
      var i = 0
      val n = x.numElements()
      while (i < n) { if (x.getInt(i) == y.getInt(i)) acc += 1; i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $acc = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.getInt($i) == $b.getInt($i)) $acc++;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** dot product of two array<double> Columns (codegen'd). */
  def dotD(a: Column, b: Column): Column =
    GraftBridge.column(DotProductD(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** positional equality count of two array<int> Columns (codegen'd). */
  def agreeI(a: Column, b: Column): Column =
    GraftBridge.column(ArrayAgreeI(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Register `graft_dot` / `graft_agree` for the SQL surface. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProductD(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_agree", exprs => ArrayAgreeI(exprs(0), exprs(1)), "scala_udf")
  }
}
