package object graft {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._

  /** Exact money sum: route a double column through decimal so the sum is
    * order-independent (bit-identical across engines / shuffle orders), then
    * surface it back as double. The reference pins DECIMAL(38,18) as its
    * canonical exact type (`spark-connector/common/.../OdpsUtils.scala:212-213`);
    * we use the same trick to make distributed double aggregation
    * deterministic: decimal addition is associative, double addition is not.
    *
    * Oracle-side equivalent: `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Deterministic average built from the exact decimal sum (same rationale
    * as [[dsum]]): one double division at the end instead of an
    * order-sensitive running mean. */
  def davg(c: Column, scale: Int = 2): Column =
    (sum(c.cast(DecimalType(18, scale))).cast(DoubleType) /
      count(c).cast(DoubleType))
}
