package graft

import org.apache.spark.sql.functions._

/** The reference CSV sink∘scan composition (KMeans.java:231-233 write,
  * :73-77 positional-schema read) must be value-exact: Spark's CSV
  * writer emits shortest-roundtrip doubles, so write→read is the
  * identity on (long, double, double) relations — the property the
  * csv_roundtrip oracle rows rest on. */
class CsvRoundtripSpec extends SparkSpec {

  test("points CSV roundtrip is bit-exact, single-file, header-less") {
    import spark.implicits._
    // awkward doubles on purpose: subnormal-ish, long mantissas, negatives
    val df = Seq(
      (1L, 0.1, -2.5), (2L, 1.0 / 3.0, 1e-300),
      (3L, 123456.789012345, -0.0), (4L, 9.87654321e15, 42.0)
    ).toDF("pid", "x", "y")
    val path = "/tmp/graft-csv-roundtrip"
    val back = Tables.csvRoundtrip(df, path)

    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(files.length == 1, "single-file sink (coalesce(1))")
    val firstLine = scala.io.Source.fromFile(files.head).getLines().next()
    assert(!firstLine.contains("pid"), "header-less sink")

    val a = df.orderBy("pid").collect()
    val b = back.orderBy("pid").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      // bit-level compare: -0.0 must survive, NaN would too
      assert(java.lang.Double.doubleToLongBits(x.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(y.getDouble(1)), s"x of $x vs $y")
      assert(java.lang.Double.doubleToLongBits(x.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(y.getDouble(2)), s"y of $x vs $y")
    }
  }

  test("roundtrip over the real points relation matches the original") {
    val pts = Tables.points(spark, "/root/testdata/sf0.001")
    val back = Tables.csvRoundtrip(pts, "/tmp/graft-csv-roundtrip-pts")
    assert(back.schema == pts.schema.copy(fields =
      pts.schema.fields.map(_.copy(nullable = true))) ||
      back.schema == pts.schema)
    assert(pts.exceptAll(back).isEmpty && back.exceptAll(pts).isEmpty)
  }

  test("JSONL roundtrip survives hostile document text") {
    import spark.implicits._
    val df = Seq(
      (1L, "plain text", "en"),
      (2L, "embedded \"quotes\" and \\backslashes\\", "en"),
      (3L, "newline\ninside and\ttab and\rcarriage", "en"),
      (4L, "control \u0001\u0002 chars", "xx"),
      (5L, "unicode: café 中文 😀   ", "zh"),
      (6L, "", "und"),          // empty text
      (7L, null, "und")         // null text survives as null, not ""
    ).toDF("doc_id", "text", "lang")
    val back = Tables.jsonlRoundtrip(df, "/tmp/graft-jsonl-roundtrip")
    val a = df.orderBy("doc_id").collect()
    val b = back.orderBy("doc_id").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x vs $y") }
    // each record is ONE line — the newline in doc 3 is escaped, so
    // line count equals row count across the shard files
    val lines = new java.io.File("/tmp/graft-jsonl-roundtrip").listFiles()
      .filter(_.getName.endsWith(".json"))
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines()).length
    assert(lines == 7, s"expected 7 JSONL lines, got $lines")
  }

  test("ORC roundtrip is value-exact incl. nulls, unicode, and -0.0") {
    import spark.implicits._
    val df = Seq(
      (1L, "unicode: café 中文 😀", Some(1.5)),
      (2L, "", Some(-0.0)),
      (3L, null: String, None: Option[Double])
    ).toDF("doc_id", "text", "score")
    val back = Tables.orcRoundtrip(df, "/tmp/graft-orc-roundtrip")
    // names+types survive (nullability widens on read-back, as for parquet)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val a = df.orderBy("doc_id").collect()
    val b = back.orderBy("doc_id").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x == y, s"$x vs $y")
      // row equality treats -0.0 == 0.0; pin the sign bit explicitly
      if (!x.isNullAt(2))
        assert(java.lang.Double.doubleToRawLongBits(x.getDouble(2)) ==
          java.lang.Double.doubleToRawLongBits(y.getDouble(2)))
    }
  }
}
