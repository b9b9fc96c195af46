package graft.tools

/** Dump a single registered query + its oracle SQL for ad-hoc compare:
  * runMain graft.tools.DumpOne <sfDir> <outDir> <query> [query...] */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names @ _*) = args.toSeq.toArray[String]
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$outDir/$n.parquet")
      graft.SparkEntry.oracleSql.get(n).foreach { sql =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/$n.sql"),
          sql.getBytes("UTF-8"))
      }
      println(s"DUMPED $n")
    }
    spark.stop()
  }
}
