package graft.tools

import org.apache.spark.sql.SparkSession

/** Times the fit on the Bench-generated 10M-point scratch parquet:
  * runMain graft.tools.Fit10M [reps]. */
object Fit10M {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pts = spark.read.parquet("target/bench_points_10m.parquet")
    val init = pts.orderBy("pid").limit(8).collect().zipWithIndex
      .map { case (r, i) => graft.kmeans.Cent(i, r.getDouble(1), r.getDouble(2)) }.toSeq
    for (r <- 1 to reps; exact <- Seq(true, false)) {
      val t0 = System.nanoTime()
      val res = graft.kmeans.KMeansFit.fit(pts, init,
        graft.kmeans.KMeansConfig(k = 8, maxIter = 10, convergence = false),
        exact = exact)
      println(f"FIT10M rep=$r exact=$exact ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        s" c0=${res.centroids.head}")
    }
    spark.stop()
  }
}
