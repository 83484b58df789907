package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd per-row text kernels. Spark's higher-order Column lambdas
  * (`filter`, `aggregate`) evaluate INTERPRETED, one boxed element per call
  * (CLAUDE.md sharp edge) — these expressions emit tight loops into
  * whole-stage codegen instead, so quality scoring / language ID run at
  * scan speed over the full corpus.
  */

/** Count of array<string> elements whose (optionally lowercased) value is in
  * a fixed vocabulary. Null elements are skipped — identical to
  * `size(filter(arr, w => lower(w).isInCollection(set)))`, where a null
  * element makes the predicate null and the filter drops it.
  */
case class CountInVocab(child: Expression, vocab: Seq[String], lowercase: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_vocab_count expects array<string>, got $t")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_vocab_count"

  @transient private lazy val vocabSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](vocab.size * 2)
    vocab.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var n = 0
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i)) {
        val e = arr.getUTF8String(i)
        val k = if (lowercase) e.toLowerCase else e
        if (vocabSet.contains(k)) n += 1
      }
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("vocabSet", vocabSet,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val e = ctx.freshName("e")
      val lower = if (lowercase) ".toLowerCase()" else ""
      s"""
         |int $n = 0;
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    UTF8String $e = $arr.getUTF8String($i)$lower;
         |    if ($setRef.contains($e)) $n++;
         |  }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sum of character lengths over array<string> (long). Identical to
  * `aggregate(arr, 0L, (acc, w) => acc + length(w))` on null-free arrays
  * (split output); null elements are skipped.
  */
case class SumCharLengths(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_sum_lengths expects array<string>, got $t")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_sum_lengths"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i)) acc += arr.getUTF8String(i).numChars()
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |long $acc = 0L;
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) $acc += $arr.getUTF8String($i).numChars();
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExprs {
  /** count of array elements in `vocab` (codegen'd). */
  def vocabCount(arr: Column, vocab: Seq[String], lowercase: Boolean = false): Column =
    GraftBridge.column(CountInVocab(GraftBridge.expression(arr), vocab, lowercase))

  /** sum of element char lengths (codegen'd, long). */
  def sumCharLengths(arr: Column): Column =
    GraftBridge.column(SumCharLengths(GraftBridge.expression(arr)))
}
