package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operating-point scout for the r16 recall-targeted ANN defaults
  * (VERDICT r15 item 1): recall@10 of each candidate default vs the
  * exact truth under its own metric, at any sfDir. Not part of the
  * bench artifact — RecallBench owns that — this is the tool that
  * picked the registered operating points.
  *
  * runMain graft.tools.TuneAnn [sfDir] */
object TuneAnn {
  private val K = 10

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = graft.Tables.table(spark, sfDir, "embeddings")
    val n = embs.count()
    println(s"TUNE n=$n autoBits=${graft.ops.EmbeddingOps.autoBits(n)} " +
      s"rpAutoP=${graft.ops.EmbeddingOps.rpAutoP(n)}")
    val cosTruth = graft.ops.EmbeddingOps.cosineTopK(embs, 0L, K)
      .collect().map(_.getLong(0)).toSet
    val vecs = graft.ops.IvfIndex.vectors(embs)
    val q = vecs.filter(col("id") === 0L).head().getSeq[Double](1)
    val qc = array(q.map(lit).toIndexedSeq: _*)
    val l2Truth = vecs.filter(col("id") =!= 0L)
      .select(col("id"), graft.kmeans.KMeansND.sqDistND(col("vec"), qc).as("d"))
      .orderBy(col("d").asc, col("id").asc).limit(K)
      .collect().map(_.getLong(0)).toSet

    def score(name: String, truth: Set[Long])(body: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      try {
        val ids = body.collect().map(_.getLong(0)).filterNot(_ == 0L).take(K)
        val r = ids.count(truth) / K.toDouble
        println(f"TUNE $name%-28s recall@10=$r%.2f " +
          f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
      } catch {
        case e: Throwable =>
          println(s"TUNE $name ERR ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(160))
      } finally {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
    }

    score("lsh_auto_t16", cosTruth)(
      graft.ops.EmbeddingOps.lshTopKAuto(embs, 0L, K))
    score("lsh_auto_t8", cosTruth)(
      graft.ops.EmbeddingOps.lshTopKAuto(embs, 0L, K, numTables = 8))
    score("rp_auto", cosTruth)(
      graft.ops.EmbeddingOps.rpTopKAuto(embs, 0L, K))
    score("pq_refined_m4kf20", l2Truth)(
      graft.ops.PqIndex.pqTopKRefined(embs, k = K + 1))
    score("pq_refined_m4kf50", l2Truth)(
      graft.ops.PqIndex.pqTopKRefined(embs, k = K + 1, kFactor = 50))
    score("pq_refined_m4n32kf20", l2Truth)(
      graft.ops.PqIndex.pqTopKRefined(embs, nlist = 32, k = K + 1))
    score("pq_refined_m8kf50", l2Truth)(
      graft.ops.PqIndex.pqTopKRefined(embs, m = 8, k = K + 1, kFactor = 50))
    score("ivfpq_refined_kf20np4", l2Truth)(
      graft.ops.PqIndex.ivfPqTopKRefined(embs, k = K + 1, nprobe = 4,
        kFactor = 20))
    spark.stop()
  }
}
