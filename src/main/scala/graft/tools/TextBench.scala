package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scaling probe for the round-9 text operators (vocab tokenization and
  * unigram-LM scoring) plus the retrieval surface they feed — reuses
  * DedupBench's deterministic synthetic corpus. The claims under test:
  * tokenizeIds is one count agg + TakeOrdered + broadcast (token stream
  * never shuffles), lmScore is two aggs + one token-key join — both
  * should grow ~linearly in corpus size with no skew sensitivity (the
  * skewed corpus plants a 0.3n-hot boilerplate header).
  *
  *   runMain graft.tools.TextBench [n1 n2 ...]   (default 100000 400000)
  */
object TextBench {

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(100000L, 400000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def timed(label: String, df: => DataFrame): Unit = {
      val runs = (1 to 2).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        noop(df)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TEXTBENCH $label ${runs.min}%8.2f s  (runs ${runs.map(r => f"$r%.2f").mkString(" ")})")
    }

    val warm = DedupBench.corpus(spark, 2000)
    noop(graft.ops.TextOps.tokenizeIds(warm))
    noop(graft.ops.TextOps.lmScore(warm))

    sizes.foreach { n =>
      val plain = s"target/dedup_bench_$n.parquet"
      if (!new java.io.File(plain, "_SUCCESS").exists())
        DedupBench.corpus(spark, n).write.mode("overwrite").parquet(plain)
      val hot = s"target/span_bench_hot_$n.parquet"
      if (!new java.io.File(hot, "_SUCCESS").exists())
        DedupBench.skewedCorpus(spark, n).write.mode("overwrite").parquet(hot)
      val docs = spark.read.parquet(plain)
      val docsHot = spark.read.parquet(hot)
      println(s"TEXTBENCH === n=$n ===")
      timed(s"n=$n tokenize_ids     ", graft.ops.TextOps.tokenizeIds(docs))
      timed(s"n=$n tokenize_ids_hot ", graft.ops.TextOps.tokenizeIds(docsHot))
      timed(s"n=$n lm_score         ", graft.ops.TextOps.lmScore(docs))
      timed(s"n=$n lm_score_hot     ", graft.ops.TextOps.lmScore(docsHot))
    }
    spark.stop()
  }
}
