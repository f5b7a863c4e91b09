package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join pruning — the canonical shuffle-avoidance lever
  * for selective joins at 100 TB: instead of shuffling the fact table to
  * discover which rows match a filtered dimension, aggregate the dim keys
  * into a fixed-size bit set (KBs–MBs regardless of fact size), ship it to
  * every fact task as a literal, and drop non-matching rows INSIDE the
  * scan stage with a codegen'd membership probe. No false negatives by
  * construction; false positives bounded by the sizing fpp, and only cost
  * a later exact filter some wasted rows.
  *
  * Spark's AQE injects exactly this shape automatically for eligible
  * shuffle joins (`spark.sql.optimizer.runtime.bloomFilter.enabled`,
  * InjectRuntimeFilter); this operator makes it an explicit, composable
  * primitive — usable in front of aggregations-without-joins,
  * multi-stage pipelines, or sinks, where the optimizer rule does not
  * reach. Built on the SAME machinery the rule uses
  * (`BloomFilterAggregate` / `BloomFilterMightContain` over `xxhash64`),
  * so the probe has real `doGenCode` and stays inside whole-stage
  * codegen.
  *
  * Reference scope: the reference joins facts to small filtered dims
  * (`sql/10_eda_queries.sql` weather-day slices); at its data sizes a
  * broadcast join wins, but the 100 TB story needs the sketch form —
  * a broadcast HASH set of 10^9 keys is tens of GB, the bloom is ~1 GB
  * at the same fpp, and the probe never builds a hash relation.
  */
object BloomPrune {

  /** Aggregate `key` (hashed with xxhash64, the builder the optimizer's
    * runtime-filter rule uses) into a serialized bloom filter sized for
    * `expectedItems` at `fpp`. One small binary row on the driver — the
    * same bounded materialization a runtime filter's scalar subquery
    * performs; the per-row work is distributed (partial sketches OR-merge
    * associatively on the map side).
    */
  def buildBloom(keys: DataFrame, key: Column, expectedItems: Long, fpp: Double): Array[Byte] = {
    val child = new XxHash64(Seq(GraftColumnBridge.expression(key)))
    val bits = BloomFilter.optimalNumOfBits(math.max(expectedItems, 1L), fpp)
    val agg = new BloomFilterAggregate(child,
      Literal(math.max(expectedItems, 1L)), Literal(bits)).toAggregateExpression()
    val row = keys.agg(GraftColumnBridge.column(agg).as("bf")).head()
    if (row.isNullAt(0)) Array.emptyByteArray else row.getAs[Array[Byte]](0)
  }

  /** Membership probe against a built bloom, as a codegen'd Column —
    * `might_contain(bloom, xxhash64(key))`. Always true for inserted
    * keys; true with probability ≈ fpp for absent ones. An EMPTY bloom
    * (no keys aggregated) rejects everything, matching the semi-join
    * against an empty dim.
    */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column = {
    if (bloomBytes.isEmpty)
      org.apache.spark.sql.functions.lit(false)
    else
      GraftColumnBridge.column(BloomFilterMightContain(
        Literal(bloomBytes, BinaryType),
        new XxHash64(Seq(GraftColumnBridge.expression(key)))))
  }
}
