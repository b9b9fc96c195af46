package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: runMain graft.tools.PlanAudit <sfDir> [query...]
  * — prints unique Exchange / BroadcastExchange counts and whether the
  * plan contains a Window or TakeOrderedAndProject, per registered
  * query (all queries when none named). Feeds PLANS.md. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.tail.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      try {
        val plan = graft.SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString
        val lines = plan.linesIterator.toSeq
        val shuffles = lines.count(_.contains("Exchange hashpartitioning")) +
          lines.count(_.contains("Exchange rangepartitioning")) +
          lines.count(_.contains("Exchange RoundRobinPartitioning"))
        val bcasts = lines.count(_.contains("BroadcastExchange"))
        val window = lines.exists(_.trim.startsWith("Window"))
        val topk = plan.contains("TakeOrderedAndProject")
        println(f"PLAN $name%-22s shuffles=$shuffles%-3d broadcasts=$bcasts%-3d" +
          f" window=$window%-5s takeOrdered=$topk")
      } catch { case e: Throwable =>
        println(s"PLAN $name ERROR ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
