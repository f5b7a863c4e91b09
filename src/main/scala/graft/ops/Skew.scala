package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins (SURVEY scale posture: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join split handles most cases automatically at runtime;
  * explicit salting remains necessary when one key's rows exceed a single
  * executor's memory even after AQE splits, or when the skewed side feeds
  * a `groupBy` (AQE does not split aggregation partitions). The classic
  * construction: the skewed (large) side gets a random salt in [0, n);
  * the small side is replicated n× with every salt value; joining on
  * (key, salt) spreads one hot key over n tasks.
  */
object Skew {

  /** Large side: append a uniform salt column. `rand` is seeded for
    * reproducibility of tests; any seed works for load-spreading.
    */
  def saltLarge(df: DataFrame, salts: Int, seed: Long = 7L): DataFrame =
    df.withColumn("__salt", (rand(seed) * salts).cast("int"))

  /** Small side: replicate every row once per salt value. */
  def replicateSmall(df: DataFrame, salts: Int): DataFrame =
    df.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))

  /** Salted inner equi-join on `keys`: one hot key now lands in `salts`
    * independent tasks. Row multiplicity is preserved exactly — each
    * large-side row matches precisely the one replica carrying its salt.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String], salts: Int): DataFrame =
    saltLarge(large, salts)
      .join(replicateSmall(small, salts), keys :+ "__salt")
      .drop("__salt")
}
