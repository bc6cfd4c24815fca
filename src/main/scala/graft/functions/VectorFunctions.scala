package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, composed from
  * Spark's higher-order functions (`zip_with`, `aggregate`) so everything
  * stays a codegen'd Catalyst expression — no UDF, no serialization fence.
  *
  * All arithmetic is widened to double and folded left-to-right, which is
  * also how the DuckDB oracle evaluates it — keeps cross-engine results
  * bit-comparable before the final `round`.
  */
object VectorFunctions {

  /** Dot product of two float-array columns, in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity given precomputed norms (precompute them once per
    * row before a pairwise join — at n² pairs the norm is the term you
    * do NOT want to recompute per pair).
    */
  def cosinePrenormed(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)
}
