package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dense-vector math over `array<float>` embedding columns, expressed with
  * Spark's higher-order array functions so everything stays codegen'd and
  * per-row (no UDF boxing, no shuffle). Elements are widened to double
  * before multiply/accumulate for precision parity with columnar engines.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1,1]; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, 0.0).otherwise(dot(a, b) / d)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast(DoubleType) - y.cast(DoubleType)
        diff * diff
      }),
      lit(0.0), (acc, v) => acc + v))

  /** Literal column for a constant query/plane vector. */
  def vec(values: Seq[Double]): Column = array(values.map(lit): _*)
}
