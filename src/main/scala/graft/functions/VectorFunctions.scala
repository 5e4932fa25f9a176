package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NativeFunctions
import org.apache.spark.sql.types.DoubleType

/** Dense-vector math over `array<float>` / `array<double>` embedding
  * columns. The default entry points delegate to the native codegen'd
  * Catalyst expressions ([[org.apache.spark.sql.graft.CosineSimilarity]]
  * etc. — one fused loop per row); the `*Hof` variants keep the
  * higher-order-function formulations as an executable spec the native
  * kernels are differential-tested against.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column = NativeFunctions.dotProduct(a, b)

  def cosine(a: Column, b: Column): Column = NativeFunctions.cosineSim(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity in [-1,1]; 0 when either vector has zero norm. */
  def cosineHof(a: Column, b: Column): Column = {
    val d = sqrt(dotHof(a, a)) * sqrt(dotHof(b, b))
    when(d === 0.0, 0.0).otherwise(dotHof(a, b) / d)
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
