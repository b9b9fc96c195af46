package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("ordersChecks counts each planted violation class exactly once") {
    val orders = Seq(
      // clean row
      (1L, 10L, "O", 100.0, ts("1995-06-01")),
      // duplicate orderkey (one dupe)
      (2L, 10L, "F", 50.0, ts("1996-01-01")),
      (2L, 10L, "F", 60.0, ts("1996-01-02")),
      // null custkey → RI check must NOT count it (null never matches,
      // but the custkey_nulls metric owns it)
      (3L, -1L, "P", 70.0, ts("1997-01-01")),
      // bad status + nonpositive price
      (4L, 10L, "X", -5.0, ts("1995-01-01")),
      // date out of range
      (5L, 10L, "O", 80.0, ts("1899-01-01")),
      // orphan custkey
      (6L, 99L, "O", 90.0, ts("1995-01-01")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .withColumn("o_custkey",
        org.apache.spark.sql.functions.when($"o_custkey" === -1L, null)
          .otherwise($"o_custkey"))
    val customer = Seq((10L, "a")).toDF("c_custkey", "c_name")
    val lineitem = Seq((1L, 1), (2L, 1), (7L, 1)) // 7 is an orphan line
      .toDF("l_orderkey", "l_linenumber")

    val got = DataQuality.ordersChecks(orders, customer, lineitem)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap

    assert(got("row_count") == ((7L, 1)))
    assert(got("orderkey_nulls") == ((0L, 1)))
    assert(got("orderkey_dupes") == ((1L, 0)))
    assert(got("custkey_nulls") == ((1L, 0)))
    assert(got("totalprice_nonpos") == ((1L, 0)))
    assert(got("status_domain") == ((1L, 0)))
    assert(got("orderdate_range") == ((1L, 0)))
    // "rows with no matching customer": order 6 (custkey 99) AND order
    // 3 (NULL custkey — null never equi-joins, in Spark's left_anti and
    // in the oracle's LEFT JOIN .. IS NULL alike)
    assert(got("ri_orders_customer") == ((2L, 0)))
    assert(got("ri_lineitem_orders") == ((1L, 0)))
    assert(got.size == 9)
  }

  test("skew report: hand-checkable top_share and hhi per key family") {
    val events = Seq(
      (1L, "click"), (1L, "click"), (1L, "view"), (2L, "click")
    ).toDF("user_id", "event_type")
    val li = Seq(Tuple1(7L), Tuple1(7L), Tuple1(8L)).toDF("l_orderkey")
    val orders = Seq(Tuple1(5L), Tuple1(6L)).toDF("o_custkey")
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text") // shingles: 2
    val rows = DataQuality.keySkewReport(events, li, orders, docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5))).toMap
    // user_id: {1→3, 2→1}: top_share 3/4, hhi (9+1)/16
    assert(rows("events.user_id") == ((2L, 4L, 3L, 0.75, 10.0 / 16.0)))
    // event_type: {click→3, view→1}
    assert(rows("events.event_type") == ((2L, 4L, 3L, 0.75, 10.0 / 16.0)))
    // l_orderkey: {7→2, 8→1}: hhi (4+1)/9
    assert(rows("lineitem.l_orderkey") == ((2L, 3L, 2L, 2.0 / 3.0, 5.0 / 9.0)))
    // uniform keys: top_share 1/n, hhi 1/n
    assert(rows("orders.o_custkey") == ((2L, 2L, 1L, 0.5, 0.5)))
    // "a b c", "b c d" → 2 distinct shingles, 1 doc each
    assert(rows("documents.shingle3") == ((2L, 2L, 1L, 0.5, 0.5)))
  }

  test("clean table passes every constraint") {
    val orders = Seq((1L, 10L, "O", 100.0, ts("1995-06-01")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val customer = Seq((10L, "a")).toDF("c_custkey", "c_name")
    val lineitem = Seq((1L, 1)).toDF("l_orderkey", "l_linenumber")
    val rows = DataQuality.ordersChecks(orders, customer, lineitem).collect()
    assert(rows.length == 9)
    assert(rows.forall { case Row(_, _, pass: Int) => pass == 1 })
  }

  test("documents DQ: planted violations trip exactly their checks") {
    import spark.implicits._
    val clean = Seq((1L, "hello world", "en", "s0", 11L),
      (2L, "guten tag", "de", "s1", 9L))
    val dirty = clean ++ Seq(
      (2L, "dupe id", "en", "s0", 7L),          // doc_id dupe
      (3L, "", "en", "s0", 0L),                 // empty text
      (4L, "bad lang", "xx", "s0", 8L),         // lang domain
      (5L, "stale count", "en", "s0", 999L))    // n_chars mismatch
    def run(rows: Seq[(Long, String, String, String, Long)]) =
      DataQuality.documentsChecks(
          rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2)))
        .toMap
    val ok = run(clean)
    assert(ok.forall(_._2._2 == 1))
    val bad = run(dirty)
    assert(bad("docid_dupes") == ((1L, 0)))
    assert(bad("text_empty") == ((1L, 0)))
    assert(bad("lang_domain") == ((1L, 0)))
    assert(bad("nchars_stale") == ((1L, 0)))
    assert(bad("source_nulls") == ((0L, 1)))
  }
}
