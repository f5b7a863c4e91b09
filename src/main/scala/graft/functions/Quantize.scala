package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the storage/IO lever for similarity
  * search at scale: a 64-dim float vector (256 B) becomes 64 bytes plus
  * two float params, cutting ANN scan IO 4x with bounded cosine error
  * (~1e-2 for uniform data — measured in QuantizeSpec, not assumed).
  *
  * Per-vector affine scheme: scale = (max-min)/255, code = round((x-min)/
  * scale) ∈ [0,255], dequant = min + code·scale. Pure column expressions;
  * round() on the non-negative operand is half-away-from-zero in both
  * Spark and the DuckDB oracle, so codes are engine-identical. A constant
  * vector (max == min) maps to all-zero codes and dequantizes exactly.
  */
object Quantize {

  /** (codes array<int>, vmin float, vmax float) as a struct column. */
  def quantize(v: Column): Column = {
    val vmin = array_min(v).cast("double")
    val vmax = array_max(v).cast("double")
    val scale = (vmax - vmin) / 255.0
    struct(
      transform(v, x =>
        when(vmax === vmin, lit(0))
          .otherwise(round((x.cast("double") - vmin) / scale).cast("int")))
        .as("codes"),
      vmin.as("vmin"),
      vmax.as("vmax"))
  }

  /** Reconstruct an array<double> from the quantized struct. */
  def dequantize(q: Column): Column = {
    val scale = (q.getField("vmax") - q.getField("vmin")) / 255.0
    transform(q.getField("codes"), c => q.getField("vmin") + c.cast("double") * scale)
  }
}
