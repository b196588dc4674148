package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from codegen'd
  * higher-order functions (`zip_with` / `aggregate`) — no UDFs, so the whole
  * computation stays inside whole-stage codegen and is usable at 100 TB.
  *
  * All arithmetic is widened to double with a deterministic sequential fold
  * order (the `aggregate` function folds left-to-right), so results are
  * bit-stable across runs and partitionings.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x
    )

  /** ‖a‖₂ in double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double; 0 for zero vectors (no NaN). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, 0.0).otherwise(dot(a, b) / denom)
  }
}
