package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cost-split probe for graph_pagerank (VERDICT r10 item 3 follow-up):
  * phase timings of the r11 loop shape — static ewd/nodes checkpoint
  * jobs, then ONE lazy job running all supersteps (see PageRankMicro
  * for the variant shoot-out that picked this shape: ckpt-per-superstep
  * 6.3 s → lazy chain 4.9 s → lazy + deg-prefold 3.7 s at sf0.1).
  *
  *   runMain graft.tools.PageRankProbe [sfDir]
  */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val lineitem = graft.Tables.table(spark, sfDir, "lineitem")

    // warm the codegen paths once
    noop(graft.ops.GraphOps.pageRank(GraphBench.edges(spark, 10000)))

    val runs = (1 to 4).map { _ =>
      val t0 = System.nanoTime()
      noop(graft.ops.GraphOps.supplierPartRank(lineitem))
      (System.nanoTime() - t0) / 1e9
    }
    println(f"PRPROBE pagerank sf0.1 best ${runs.min}%6.2f s  " +
      s"(runs ${runs.map(r => f"$r%.2f").mkString(" ")})")
    // deep-run shape: 12 supersteps with ckptEvery=4 — verifies the
    // periodic checkpoint bounds plan depth without per-step jobs
    val e = lineitem.select(
      (col("l_suppkey") * 2).as("src"),
      (col("l_partkey") * 2 + 1).as("dst"))
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val deep = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      noop(graft.ops.GraphOps.pageRank(sym, iters = 12, ckptEvery = 4))
      (System.nanoTime() - t0) / 1e9
    }
    println(f"PRPROBE pagerank 12it/ckpt4 best ${deep.min}%6.2f s  " +
      s"(runs ${deep.map(r => f"$r%.2f").mkString(" ")})")
    spark.stop()
  }
}
