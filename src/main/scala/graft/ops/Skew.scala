package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities — the "salting for skew" half of the
  * 100 TB posture (the other half, AQE's runtime skew-join splitting,
  * is enabled in every session this engine builds; salting is for the
  * cases AQE can't fix: skewed AGGREGATION keys and non-AQE engines).
  *
  * Semantics contract: every salted op returns exactly what its
  * unsalted equivalent returns — verified by equivalence tests.
  */
object Skew {

  /** Two-stage salted aggregation: count/sum-like partial aggregation
    * under a salted key, then a final merge under the true key. Breaks
    * a hot key's partial agg across `saltFactor` reducers. Spark's
    * map-side partial aggregation already bounds most agg skew; salting
    * matters when the DISTINCT map-side groups themselves explode (high
    * cardinality per partition) or partial agg is disabled.
    *
    * Supported merges: sum / count via (column, "sum"|"count") specs.
    */
  def saltedAgg(
      df: DataFrame, key: String, saltFactor: Int,
      sums: Seq[String]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + crc32(col(key).cast("string")), lit(saltFactor)))
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__cnt"),
        sums.map(c => sum(col(c)).as(s"__sum_$c")): _*)
    partial.groupBy(col(key))
      .agg(sum("__cnt").as("cnt"),
        sums.map(c => sum(s"__sum_$c").as(s"sum_$c")): _*)
  }

  /** Salted join of a skewed left against a small-ish right: replicate
    * the right side `saltFactor` times, salt the left uniformly, join on
    * (key, salt). Result set identical to the plain join; the hot key's
    * rows spread over saltFactor tasks. Right side grows ×saltFactor —
    * use only when right fits that blow-up (else AQE skew-join or a
    * broadcast is the answer). */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
