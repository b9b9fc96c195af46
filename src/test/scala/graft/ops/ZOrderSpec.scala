package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton interleaves bits: x odd positions, y even") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 3L), (65535L, 65535L))
      .toDF("qx", "qy")
      .select(col("qx"), col("qy"), Layout.morton(col("qx"), col("qy")).as("m"))
    val m = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m((0L, 0L)) == 0L)
    assert(m((1L, 0L)) == 2L) // x bit 0 -> position 1
    assert(m((0L, 1L)) == 1L) // y bit 0 -> position 0
    assert(m((1L, 1L)) == 3L)
    assert(m((3L, 3L)) == 15L)
    assert(m((65535L, 65535L)) == (1L << 32) - 1)
  }

  test("quantize saturates at the domain edges") {
    val df = Seq(-5.0, 0.0, 55000.0, 109999.999, 200000.0).toDF("x")
      .select(Layout.quantize(col("x"), 110000.0).as("q"))
    val qs = df.collect().map(_.getLong(0))
    assert(qs(0) == 0L && qs(1) == 0L)
    assert(qs(2) == (55000.0 / 110000.0 * 65536).toLong)
    assert(qs(3) == 65535L && qs(4) == 65535L)
  }

  test("z-ordered layout: each output partition owns a contiguous code range") {
    val pts = Tables.points(spark, "/root/testdata/sf0.001")
    val parts = Layout.zOrdered(pts, numFiles = 4)
      .select("zorder")
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSeq))
      .collect().filter(_.nonEmpty)
    assert(parts.length > 1)
    // within-partition sorted
    parts.foreach(p => assert(p == p.sorted, "sortWithinPartitions"))
    // across partitions: ranges must not interleave
    val ranges = parts.map(p => (p.min, p.max)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) => assert(aMax <= bMin, "contiguous curve segments")
      case _ =>
    }
  }

  private val Tables = graft.Tables
}
