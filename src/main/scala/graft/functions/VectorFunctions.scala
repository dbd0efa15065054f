package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Vector math as Catalyst column expressions (no UDFs on the hot path).
  *
  * Cosine similarity is the reference's only distance metric (usearch
  * `MetricKind::Cos`; score = 1 - distance, i.e. the cosine itself —
  * src/collection/vector_index.rs:141-149). We compute in f64 regardless of
  * storage dtype so results are stable and match a DuckDB oracle casting
  * FLOAT[] -> DOUBLE[].
  *
  * `dot`/`cosine` are backed by the fused-loop codegen Expressions in
  * [[graft.plans]]; the declarative `zip_with` + `aggregate` form is kept
  * as [[cosineHof]] purely as the property-test reference (HOF lambdas run
  * interpreted — ~10x slower on similarity joins).
  */
object VectorFunctions {

  private def asDouble(c: Column): Column = c.cast(ArrayType(DoubleType))

  private def native(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(e)
  private def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graftops.ColumnBridge.expression(c)

  /** Dot product of two array columns, computed in f64 (fused codegen loop,
    * [[graft.plans.DotProduct]]).
    */
  def dot(a: Column, b: Column): Column =
    native(graft.plans.DotProduct(expr(asDouble(a)), expr(asDouble(b))))

  /** L2 norm in f64. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; 0 when either vector has zero norm.
    * Backed by the fused codegen loop in [[graft.plans.CosineSimilarity]];
    * numerically identical to [[cosineHof]] (f64, index-order accumulation).
    */
  def cosine(a: Column, b: Column): Column =
    native(graft.plans.CosineSimilarity(expr(asDouble(a)), expr(asDouble(b))))

  /** Declarative (higher-order-function) cosine — kept as the reference
    * implementation the codegen Expression is property-tested against.
    * ~20x slower on similarity joins: the lambdas run interpreted.
    */
  def cosineHof(a: Column, b: Column): Column = {
    def hofDot(x: Column, y: Column): Column =
      aggregate(zip_with(asDouble(x), asDouble(y), _ * _), lit(0.0), _ + _)
    val denom = sqrt(hofDot(a, a)) * sqrt(hofDot(b, b))
    when(denom === lit(0.0), lit(0.0)).otherwise(hofDot(a, b) / denom)
  }

  /** Squared euclidean distance in f64 (used by IVF assignment). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _)
}
