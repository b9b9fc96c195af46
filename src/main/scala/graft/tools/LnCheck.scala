package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: which libm does Spark's ln() use at runtime, and does it
  * bit-match DuckDB on the idf input domain? (decides whether an ln-based
  * score can sit under the hash-exact oracle gate) */
object LnCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val xs = Seq(1.2572145545796738, 1.5944524151123864, 1.3697617091207888,
                 1.352718420340817, 1.2982866043613708, 2.0, 10.0, 500.0 / 3.0)
    val rows = xs.toDF("x").select(col("x"), log(col("x")).as("lnx")).collect()
    rows.foreach { r =>
      val x = r.getDouble(0); val l = r.getDouble(1)
      val sb = java.lang.Double.doubleToRawLongBits(l)
      val mb = java.lang.Double.doubleToRawLongBits(Math.log(x))
      val tb = java.lang.Double.doubleToRawLongBits(StrictMath.log(x))
      println(s"LNCHECK $x spark=$sb math=$mb strict=$tb matchMath=${sb == mb} matchStrict=${sb == tb}")
    }
    spark.stop()
  }
}
