package graft

import graft.functions.{ArrayAgreeI, DotProductD, Murmur2Expr, U64Fold}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension hook: registers the engine's codegen'd expressions for
  * the pure-SQL surface, the idiomatic deployment path —
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * gives every session `graft_dot`, `graft_agree`, `graft_murmur2` without
  * any Scala call. (The temp-function `register(...)` helpers on
  * VectorExprs/Murmur2Expr remain for notebook-style sessions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, clazz: Class[_], arity: Int,
                 build: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getCanonicalName, name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == arity, s"$name expects $arity arguments, got ${exprs.length}")
        build(exprs)
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("graft_dot", classOf[DotProductD], 2,
      e => DotProductD(e(0), e(1))))
    ext.injectFunction(fn("graft_agree", classOf[ArrayAgreeI], 2,
      e => ArrayAgreeI(e(0), e(1))))
    ext.injectFunction(fn("graft_murmur2", classOf[Murmur2Expr], 2,
      e => Murmur2Expr(e(0), e(1))))
    ext.injectFunction(fn("graft_u64fold", classOf[U64Fold], 1,
      e => U64Fold(e(0))))
  }
}
