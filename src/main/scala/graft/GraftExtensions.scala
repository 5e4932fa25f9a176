package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import org.apache.spark.sql.graft.{CosineSimilarity, DotProduct, SimHash64, TokenCount}

/** Session extensions: inject the native expressions as SQL functions —
  * the registration pattern of the reference's `OdpsExtensions`
  * (`spark-connector/.../extension/OdpsExtensions.scala:190-194`), minus
  * the write-rule machinery Spark's file sources already cover.
  *
  * Use: `.config("spark.sql.extensions", "graft.GraftExtensions")`, or call
  * [[graft.functions.NativeFunctions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      exprs => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      exprs => SimHash64(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("token_count"),
      new ExpressionInfo(classOf[TokenCount].getName, "token_count"),
      exprs => TokenCount(exprs.head)))
  }
}
