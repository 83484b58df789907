package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

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

/** Codegen'd order-sensitive u64 polynomial fold over an array<int> or
  * array<long> column — the scalar digest that lets a driver-compared query
  * pin a committed array artifact without carrying the array itself (the
  * driver's pandas sort cannot hash ndarray cells; CORRECTNESS r6 regressed
  * 8 rows to `err` on exactly that). Semantics:
  *
  *   acc0 = 1469598103934665603 (FNV-1a 64 offset, the q_fingerprint seed)
  *   acc  = acc * 1000003 + u(elem)    (Long wrap-around == mod 2^64)
  *
  * where u(elem) = elem & 0xffffffff for int elements (signature values are
  * unsigned 32-bit) and the raw two's-complement value for long elements.
  * DuckDB replays it with the q_fingerprint HUGEINT emulation
  * (SparkEntry.u64FoldSqlI / u64FoldSqlL). Null array -> null.
  */
case class U64Fold(child: Expression) extends UnaryExpression {

  private lazy val elemIsInt: Boolean = child.dataType match {
    case ArrayType(IntegerType, _) => true
    case _                         => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_u64fold expects array<int> or array<bigint>, got $t")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_u64fold"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = U64Fold.Offset
    var i = 0
    val n = x.numElements()
    if (elemIsInt)
      while (i < n) { acc = acc * U64Fold.Prime + (x.getInt(i) & 0xffffffffL); i += 1 }
    else
      while (i < n) { acc = acc * U64Fold.Prime + x.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val elem =
        if (elemIsInt) s"(((long) $a.getInt($i)) & 0xffffffffL)"
        else s"$a.getLong($i)"
      s"""
         |long $acc = ${U64Fold.Offset}L;
         |final int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = $acc * ${U64Fold.Prime}L + $elem;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object U64Fold {
  val Offset: Long = 1469598103934665603L
  val Prime: Long = 1000003L

  /** JVM twin of the expression for spec golden checks. */
  def foldInts(xs: Array[Int]): Long = {
    var acc = Offset; var i = 0
    while (i < xs.length) { acc = acc * Prime + (xs(i) & 0xffffffffL); i += 1 }
    acc
  }

  def foldLongs(xs: Array[Long]): Long = {
    var acc = Offset; var i = 0
    while (i < xs.length) { acc = acc * Prime + xs(i); i += 1 }
    acc
  }
}

object VectorExprs {
  /** dot product of two array<double> Columns (codegen'd). */
  def dotD(a: Column, b: Column): Column =
    GraftBridge.column(DotProductD(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** positional equality count of two array<int> Columns (codegen'd). */
  def agreeI(a: Column, b: Column): Column =
    GraftBridge.column(ArrayAgreeI(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** u64 polynomial digest of an array<int>/array<long> Column (codegen'd). */
  def u64Fold(a: Column): Column =
    GraftBridge.column(U64Fold(GraftBridge.expression(a)))

  /** Register `graft_dot` / `graft_agree` / `graft_u64fold` for SQL. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProductD(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_agree", exprs => ArrayAgreeI(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_u64fold", exprs => U64Fold(exprs(0)), "scala_udf")
  }
}
