package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Variant shoot-out for the PageRank loop shape at sf0.1 (VERDICT r10
  * item 3). Unlike kCore (3 self-references per round → exponential
  * lazy lineage), each superstep references the previous rank exactly
  * ONCE — lineage is linear — so the per-superstep eager checkpoint
  * may be pure job-scheduling overhead. Variants:
  *   V1 ckpt-per-superstep (current shape)
  *   V2 lazy superstep chain (statics checkpointed, one final job)
  *   V3 V2 + deg pre-folded into the edge relation (one static join
  *      removes the per-superstep rank⋈deg join)
  * runMain graft.tools.PageRankMicro [sfDir] */
object PageRankMicro {
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
    val Grid = 1.0e12

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(label: String)(body: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"PRMICRO $label%-34s best ${runs.min}%6.2f s " +
        s"(${runs.map(r => f"$r%.2f").mkString(" ")})")
    }

    val lineitem = graft.Tables.table(spark, sfDir, "lineitem")
    def edgeRel = {
      val e = lineitem.select(
        (col("l_suppkey") * 2).as("src"),
        (col("l_partkey") * 2 + 1).as("dst"))
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    }

    // V1: the registered query as-is
    noop(graft.ops.GraphOps.pageRank(GraphBench.edges(spark, 10000)))
    t("V1 ckpt-per-superstep")(
      noop(graft.ops.GraphOps.supplierPartRank(lineitem)))

    def lazyChain(prefold: Boolean): DataFrame = {
      val damping = 0.85; val base = 1.0 - damping
      val edges = edgeRel.select("src", "dst").distinct().localCheckpoint(true)
      val deg = edges.groupBy(col("src").as("dnode"))
        .agg(count(lit(1)).as("deg")).localCheckpoint(true)
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct()
        .localCheckpoint(true)
      val nRow = nodes.agg(count(lit(1)).as("n"))
      val ewd = if (prefold)
        edges.join(deg, col("src") === col("dnode"))
          .select(col("src"), col("dst"), col("deg")).localCheckpoint(true)
      else null
      def freshRank(sums: Option[DataFrame]): DataFrame = sums match {
        case None =>
          nodes.crossJoin(broadcast(nRow))
            .select(col("node"), (lit(1.0) / col("n").cast("double")).as("rank"))
        case Some(sg) =>
          nodes.crossJoin(broadcast(nRow))
            .join(sg, Seq("node"), "left")
            .select(col("node"),
              (lit(base) * (lit(1.0) / col("n").cast("double")) +
                lit(damping) * (coalesce(col("sg").cast("double"), lit(0.0))
                  / lit(Grid))).as("rank"))
      }
      var rank = freshRank(None)
      for (_ <- 1 to 3) {
        val sums =
          if (prefold)
            ewd.join(rank, col("src") === col("node"))
              .select(col("dst"),
                round(col("rank") / col("deg").cast("double") * Grid)
                  .cast("long").as("g"))
              .groupBy(col("dst").as("node")).agg(sum(col("g")).as("sg"))
          else {
            val perSrc = rank.join(deg, col("node") === col("dnode"))
              .select(col("node").as("cnode"),
                (col("rank") / col("deg").cast("double")).as("c"))
            edges.join(perSrc, col("src") === col("cnode"))
              .groupBy(col("dst").as("node"))
              .agg(sum(round(col("c") * Grid).cast("long")).as("sg"))
          }
        rank = freshRank(Some(sums))
      }
      rank
    }
    t("V2 lazy chain")(noop(lazyChain(prefold = false)))
    t("V3 lazy chain + deg prefold")(noop(lazyChain(prefold = true)))
    spark.stop()
  }
}
