package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Two-pass Misra–Gries heavy hitters — exactness, partitioning
  * invariance, and the bounded-candidate guarantee. */
class HeavyHittersSpec extends SparkSpec {

  private def docsOf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("output equals the exact HAVING-threshold set, any partitioning") {
    import spark.implicits._
    // skewed corpus: 'a' 40%, 'b' 20%, long uniform tail
    val words = Seq.fill(40)("a") ++ Seq.fill(20)("b") ++
      (0 until 40).map(i => s"t$i")
    val docs = docsOf(words.grouped(7).map(_.mkString(" ")).toSeq)
    val expected = TextOps.explodedTokens(docs, "token")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * 11 > lit(words.size.toLong))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    Seq(docs, docs.repartition(1), docs.repartition(13)).foreach { d =>
      val got = HeavyHitters.heavyHitters(d, s = 10)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected)
    }
    assert(expected.map(_._1) == Set("a", "b"))
  }

  test("MG pass keeps at most s keys per partition") {
    import spark.implicits._
    val toks = (0 until 10000).map(i => s"w${i % 997}").toDS.repartition(4)
    val perPart = HeavyHitters.mgCandidates(toks, 16)
      .mapPartitions(it => Iterator.single(it.size)).collect()
    assert(perPart.forall(_ <= 16))
  }

  test("superset guarantee survives adversarial partition placement") {
    import spark.implicits._
    // token 'hh' is heavy globally (30%) but diluted in partition 0;
    // MG must still surface it from some partition
    val part0 = Seq.fill(5)("hh") ++ (0 until 95).map(i => s"a$i")
    val part1 = Seq.fill(55)("hh") ++ (0 until 45).map(i => s"b$i")
    val docs = docsOf(Seq(part0.mkString(" "), part1.mkString(" "))).repartition(2)
    val got = HeavyHitters.heavyHitters(docs, s = 9)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("hh" -> 60L))
  }

  test("empty corpus and no-hitter corpus both yield empty results") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(HeavyHitters.heavyHitters(empty, s = 4).count() == 0L)
    val uniform = docsOf(Seq((0 until 50).map(i => s"u$i").mkString(" ")))
    assert(HeavyHitters.heavyHitters(uniform, s = 4).count() == 0L)
  }

  test("registered query/oracle pair exists") {
    assert(graft.SparkEntry.queries.contains("text_heavy_hitters"))
    assert(graft.SparkEntry.oracleSql.contains("text_heavy_hitters"))
  }
}
