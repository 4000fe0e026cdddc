package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over embedding columns (`array<float>` in the lake,
  * promoted to `array<double>` before any arithmetic so accumulation
  * happens in double — float*float partial products are not what any
  * ANN system wants, and the promotion also matches how SQL engines
  * (and the DuckDB oracle) compute list similarity).
  *
  * Built on higher-order functions (`zip_with`/`aggregate`), which stay in
  * the codegen'd expression pipeline — no UDF serialization per row. For
  * 100 TB the dot product is the inner loop of a broadcast-probe join; an
  * expression tree here means Tungsten evaluates it over packed
  * `UnsafeArrayData` without boxing.
  */
object VectorOps {

  /** Promote array<float> → array<double>. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Σ aᵢ·bᵢ via a sequential left fold — deterministic order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot / (‖a‖·‖b‖). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
