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

  /** `BloomFilterAggregate` silently CLAMPS its sizing to the session
    * confs `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (4M
    * default) and `.maxNumBits` (64M default): a build sized for more
    * keys would quietly degrade to a far higher fpp than requested — at
    * 10^9 keys the probe becomes a near-pass-through and the fp audit
    * flips. Oversized requests must therefore fail LOUDLY; callers that
    * genuinely need a bigger sketch raise those confs first, which also
    * raises this guard.
    */
  private def requireWithinClamp(keys: DataFrame, items: Long, bits: Long): Unit = {
    val conf = keys.sparkSession.conf
    val maxItems = conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems").toLong
    val maxBits = conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits").toLong
    require(items <= maxItems && bits <= maxBits,
      s"bloom sizing (items=$items, bits=$bits) exceeds the session clamp " +
        s"(maxNumItems=$maxItems, maxNumBits=$maxBits) — BloomFilterAggregate " +
        "would silently truncate the sketch and degrade fpp; raise " +
        "spark.sql.optimizer.runtime.bloomFilter.{maxNumItems,maxNumBits} to build this size")
  }

  /** Aggregate `key` (hashed with xxhash64, the builder the optimizer's
    * runtime-filter rule uses) into a serialized bloom filter sized for
    * `expectedItems` at `fpp`. One small binary row on the driver — the
    * same bounded materialization a runtime filter's scalar subquery
    * performs; the per-row work is distributed (partial sketches OR-merge
    * associatively on the map side).
    */
  def buildBloom(keys: DataFrame, key: Column, expectedItems: Long, fpp: Double): Array[Byte] =
    buildBloomWithCount(keys, key, expectedItems, fpp, rebuildOnOverflow = false)._1

  /** Single-action build: the sketch (sized for `capacityHint`), the row
    * count, and a DISTINCT-key estimate come out of ONE aggregation job —
    * the shape a runtime filter wants, where a separate pre-count would
    * double the dim-side passes. The hint plays the role table statistics
    * play on a real warehouse (a runtime filter consults stats, it never
    * pre-scans). Bloom fpp is governed by DISTINCT insertions, not rows
    * (re-inserting a key flips no new bits), so the undershoot check and
    * the rebuild size both use the same job's `approx_count_distinct`
    * (rsd 0.02, padded 10%): a duplicate-heavy key column — the case
    * where rows ≫ distinct — neither triggers a pointless rebuild nor
    * slams into the clamp guard at row-count scale. When the DISTINCT
    * estimate exceeds the hint, the sketch's effective fpp is worse than
    * requested and the build rebuilds once at the estimated size — a
    * rare second pass replacing a guaranteed extra pass on every call.
    * Overshooting merely lowers the realized fpp; both directions keep
    * the no-false-negative guarantee. Returns (sketch, ROW count).
    */
  def buildBloomWithCount(keys: DataFrame, key: Column, capacityHint: Long, fpp: Double,
                          rebuildOnOverflow: Boolean = true): (Array[Byte], Long) = {
    import org.apache.spark.sql.functions.{approx_count_distinct, count, lit}
    def once(cap: Long): (Array[Byte], Long, Long) = {
      val child = new XxHash64(Seq(GraftColumnBridge.expression(key)))
      val capped = math.max(cap, 1L)
      val bits = BloomFilter.optimalNumOfBits(capped, fpp)
      requireWithinClamp(keys, capped, bits)
      val agg = new BloomFilterAggregate(child,
        Literal(capped), Literal(bits)).toAggregateExpression()
      val row = keys.agg(
        GraftColumnBridge.column(agg).as("bf"),
        count(lit(1)).as("n"),
        approx_count_distinct(key, 0.02).as("nd")).head()
      val bytes = if (row.isNullAt(0)) Array.emptyByteArray else row.getAs[Array[Byte]](0)
      (bytes, row.getLong(1), row.getLong(2))
    }
    val (bytes, n, distinctEst) = once(capacityHint)
    if (distinctEst <= math.max(capacityHint, 1L) || !rebuildOnOverflow) (bytes, n)
    else {
      val resized = distinctEst + distinctEst / 10
      System.err.println(s"[bloom] capacity hint $capacityHint undershot ~$distinctEst " +
        s"distinct keys — rebuilding at $resized")
      (once(resized)._1, n)
    }
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
