package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Parallelism-sensitivity sweep for the headline fit — the
  * core-for-core datapoint VERDICT r9 asked for: the reference
  * publishes p=1 vs p=4 runs (scripts/script_1.sh:29 `flink run -p`,
  * notebook cell 41: 10M points / 10 iters / p=4 = 90.8 s,
  * BASELINE.md), while Bench's fit10m runs only at local[32].
  *
  * Runs the identical 10M-point 10-iteration fit under local[p] for
  * each requested p, one SparkContext at a time (shuffle.partitions
  * = p, matching how a p-slot Flink TaskManager parallelizes).
  *
  * Usage: runMain graft.tools.FitPar [pList=1,4,32] [reps=2]
  */
object FitPar {
  def main(args: Array[String]): Unit = {
    val ps = args.headOption.getOrElse("1,4,32").split(",").map(_.trim.toInt)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val path = "target/bench_points_10m.parquet"

    // generate the scratch once at full width, then fit per-p
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      val gen = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false").getOrCreate()
      gen.sparkContext.setLogLevel("WARN")
      gen.range(0, 10000000L, 1, 32)
        .select(col("id").as("pid"),
          (pmod(xxhash64(col("id"), lit(1)), lit(10000000L)) / 100.0).as("x"),
          (pmod(xxhash64(col("id"), lit(2)), lit(10000000L)) / 100.0).as("y"))
        .write.mode("overwrite").parquet(path)
      gen.stop()
    }

    ps.foreach { p =>
      val spark = SparkSession.builder()
        .master(s"local[$p]")
        .config("spark.sql.shuffle.partitions", p)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val pts = spark.read.parquet(path)
      val init = pts.orderBy("pid").limit(8).collect().zipWithIndex
        .map { case (r, i) => graft.kmeans.Cent(i, r.getDouble(1), r.getDouble(2)) }
        .toSeq
      val times = (1 to reps).map { r =>
        val t0 = System.nanoTime()
        val res = graft.kmeans.KMeansFit.fit(pts, init,
          graft.kmeans.KMeansConfig(k = 8, maxIter = 10, convergence = false),
          exact = false)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"FITPAR p=$p rep=$r $sec%.2f s c0=${res.centroids.head}")
        sec
      }
      println(f"FITPAR p=$p best=${times.min}%.2f s (baseline p=4: 90.8 s)")
      spark.stop()
    }
  }
}
