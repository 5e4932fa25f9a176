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

  /** Per-vector absmax scale for symmetric int8 quantization:
    * `max(|v_i|) / 127`, 0.0 for the all-zero vector. */
  def int8Scale(v: Column): Column =
    array_max(transform(v, x => abs(x.cast(DoubleType)))) / 127.0

  /** Symmetric int8 quantization (`array<int>` in [-127, 127]):
    * `floor(v_i / scale + 0.5)`, the all-zero vector (scale 0) maps to
    * zeros. floor(x + 0.5) instead of round(x): floor is exact IEEE with
    * no rounding-mode or half-rule dependence, so the quantized vector is
    * bit-identical on any engine/version that evaluates the same doubles
    * (round()'s half-handling for DOUBLE is engine-build-dependent).
    * `scale` must be a previously-projected [[int8Scale]] column — passing
    * the scale EXPRESSION inline would get inlined into the per-element
    * lambda and recomputed dim× per row (the Catalyst lambda-inlining
    * hazard; see minhashSignaturesPosting). Storing (scale, int8 vector)
    * shrinks an fp32 embedding column 4× — at 100 TB that is the
    * difference between an ANN index that fits executor memory and one
    * that doesn't. */
  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale === 0.0, 0)
        .otherwise(floor(x.cast(DoubleType) / scale + 0.5).cast("int")))

  /** Dequantized copy of an int8 vector: `q_i · scale`, `array<double>`. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast(DoubleType) * scale)

  /** L2-normalized copy (`array<double>`, unit norm); zero vectors pass
    * through unchanged. `norm` must be a previously-projected [[norm]]
    * column (same inlining hazard as [[quantizeInt8]]). Normalizing once
    * at ingest turns every downstream cosine into a plain dot product. */
  def l2Normalize(v: Column, norm: Column): Column =
    transform(v, x =>
      when(norm === 0.0, 0.0).otherwise(x.cast(DoubleType) / norm))
}
