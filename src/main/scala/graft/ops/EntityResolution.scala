package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked entity resolution (record linkage) — match a "dirty" export
  * of an entity table back to the canonical source without ever going
  * all-pairs, the way a CRM/vendor-feed reconciliation job runs.
  *
  * Pipeline shape (Fellegi-Sunter style, declarative):
  *  1. BLOCKING — both sides derive a cheap key (here: nation +
  *     last-4-char name suffix, which edit noise in the stem never
  *     touches); candidate generation is an EQUI join on the key, so
  *     it shuffles on the blocking key and the candidate count is
  *     bounded by the block-size distribution, never |A|·|B|.
  *  2. SCORING — `levenshtein` on the blocked pairs only (codegen'd
  *     built-in on both engines).
  *  3. RESOLUTION — best-match-per-right-row through the custom
  *     TopKPerKey physical operator at k=1 under a TOTAL order
  *     (distance, then candidate key): partial heaps keep one row per
  *     b_id per partition, so the resolution exchange carries ≤
  *     |B|·partitions rows — no Window, no per-group sort.
  *
  * The dirty side is derived in-plan (vowels stripped from the
  * lowercased name — a deterministic, cross-engine `translate`), so
  * the query self-labels: `correct` = matched key equals the source
  * key, making precision measurable in the same result.
  *
  * At 100 TB: blocking is the only knob that matters — the join is a
  * plain shuffle equi join; a hot block (skewed suffix) is AQE
  * skew-splittable because nothing downstream needs co-partitioning
  * beyond b_id, which TopKPerKey re-exchanges anyway.
  */
object EntityResolution {

  def matchCustomers(customer: DataFrame): DataFrame = {
    val aName = lower(col("c_name"))
    val a = customer.select(
      col("c_custkey"), col("c_nationkey").as("a_nationkey"),
      aName.as("a_name"),
      aName.substr(greatest(length(aName) - 3, lit(1)), lit(4)).as("a_bk"))
    val bName = translate(lower(col("c_name")), "aeiou", "")
    val b = customer.select(
      col("c_custkey").as("b_id"), col("c_nationkey").as("b_nationkey"),
      bName.as("b_name"),
      bName.substr(greatest(length(bName) - 3, lit(1)), lit(4)).as("b_bk"))
    val cand = b.join(a,
      col("b_nationkey") === col("a_nationkey") && col("b_bk") === col("a_bk"))
      .select(col("b_id"), col("c_custkey"),
        levenshtein(col("a_name"), col("b_name")).as("dist"))
    val best = org.apache.spark.sql.graft.TopKPerKey(
      cand, Seq("b_id"), Seq("dist" -> true, "c_custkey" -> true), k = 1)
    best.select(col("b_id"), col("c_custkey").as("match_custkey"),
      col("dist").cast("long").as("dist"),
      when(col("c_custkey") === col("b_id"), 1).otherwise(0).as("correct"))
  }

  def matchCustomersSql(): String =
    """WITH a AS (
      |  SELECT c_custkey, c_nationkey AS a_nationkey,
      |    lower(c_name) AS a_name,
      |    substr(lower(c_name),
      |      greatest(length(lower(c_name)) - 3, 1), 4) AS a_bk
      |  FROM customer),
      |b AS (
      |  SELECT c_custkey AS b_id, c_nationkey AS b_nationkey,
      |    translate(lower(c_name), 'aeiou', '') AS b_name,
      |    substr(translate(lower(c_name), 'aeiou', ''),
      |      greatest(length(translate(lower(c_name), 'aeiou', '')) - 3, 1), 4)
      |      AS b_bk
      |  FROM customer),
      |cand AS (
      |  SELECT b.b_id, a.c_custkey,
      |    levenshtein(a.a_name, b.b_name) AS dist
      |  FROM b JOIN a
      |    ON b.b_nationkey = a.a_nationkey AND b.b_bk = a.a_bk),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY b_id ORDER BY dist, c_custkey) AS rn
      |  FROM cand)
      |SELECT b_id, c_custkey AS match_custkey, CAST(dist AS BIGINT) AS dist,
      |  CASE WHEN c_custkey = b_id THEN 1 ELSE 0 END AS correct
      |FROM r WHERE rn = 1""".stripMargin
}
