package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted ops must be RESULT-equivalent to their unsalted forms on a
  * deliberately skewed dataset (90% of rows share one key). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = spark.range(10000).select(
    when(col("id") % 10 =!= 0, lit("hot")).otherwise(concat(lit("k"), col("id"))).as("k"),
    (col("id") % 7).cast("double").as("v"))

  test("saltedAgg equals plain groupBy aggregation") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedAgg(skewed, "k", saltFactor = 8, sums = Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain join on a skewed key") {
    val dim = Seq(("hot", 1), ("k10", 2), ("k20", 3)).toDF("k", "attr")
    val plain = skewed.join(dim, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("attr").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", saltFactor = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("attr").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join spreads the hot key across salt partitions") {
    val dim = Seq(("hot", 1)).toDF("k", "attr")
    val saltedLeft = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
    val saltCount = saltedLeft.filter(col("k") === "hot")
      .select("__salt").distinct().count()
    assert(saltCount > 1) // the hot key occupies multiple salt buckets
  }
}
