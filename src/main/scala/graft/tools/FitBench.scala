package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B timing for the fit loop's exact-decimal vs double-sum paths:
  * runMain graft.tools.FitBench <sfDir> [reps]. */
object FitBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = graft.kmeans.KMeansConfig(k = 8, maxIter = 10, convergence = false)
    for (r <- 1 to reps; exact <- Seq(true, false)) {
      val pts = graft.Tables.points(spark, sfDir)
      val init = graft.Tables.initCentroids(spark, sfDir, 8)
      val t0 = System.nanoTime()
      val res = graft.kmeans.KMeansFit.fit(pts, init, cfg, exact = exact)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"FITBENCH rep=$r exact=$exact $sec%.2f s c0=${res.centroids.head}")
    }
    spark.stop()
  }
}
