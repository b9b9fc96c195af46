package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered exact semi join.
  *
  * The plain `big SEMI JOIN small ON key` shuffles the ENTIRE big side
  * when the small side is too large to broadcast — at 100 TB that
  * shuffle is the job. The standard fix (what Spark's own AQE runtime
  * row-level filtering injects when it fires, and what this operator
  * guarantees explicitly) is a Bloom filter built from the small side's
  * keys and applied to the big side's SCAN STAGE: non-matching rows
  * (all but an fpp fraction) die before the exchange, so the shuffle
  * carries ~|matches| rows instead of |big|. The exact semi join then
  * runs on the survivors, so false positives are removed and THE RESULT
  * IS EXACT regardless of fpp — the filter only trades memory
  * (1.2·n·ln(1/fpp)/ln²2 bits) against shuffle reduction.
  *
  * The membership probe wraps Spark's public BloomFilter sketch
  * (`DataFrameStatFunctions.bloomFilter` / `mightContainLong`) in a
  * scalar UDF: the catalyst-native `might_contain` expression exists
  * but is `private[sql]` (reserved for the AQE-injected runtime
  * filter), and one long-hash per row in an interpreted projection is
  * noise next to the exchange it eliminates.
  */
object BloomJoin {

  /** Exact `big SEMI JOIN small` on long keys, with the big side
    * pre-shrunk by a Bloom filter of the small side's keys before the
    * join's exchange. `expectedItems`/`fpp` size the sketch (driver +
    * broadcast resident — 1 MB per ~1M keys at 1% fpp). */
  def bloomSemiJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val spark = big.sparkSession
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bfBc = spark.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bfBc.value.mightContainLong(k))
    big.filter(mightContain(col(bigKey)))
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }
}
