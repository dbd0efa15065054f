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
  * Built from `zip_with` + `aggregate` higher-order functions — declarative,
  * null-safe, and whole-plan optimizable. (A custom codegen `Expression`
  * variant lives in [[graft.plans.CosineSimilarity]] for the hot path.)
  */
object VectorFunctions {

  private def asDouble(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Dot product of two array columns, computed in f64. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _), lit(0.0), _ + _)

  /** L2 norm in f64. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === lit(0.0), lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Squared euclidean distance in f64 (used by IVF assignment). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _)
}
