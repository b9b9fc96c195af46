package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IO layer: parquet testdata readers, the shared `points` relation the
  * k-means surface runs on, and reference-parity CSV sources/sinks.
  *
  * Reference semantics (see SURVEY.md §1.3-1.4): CSV is read with a fixed
  * positional schema and the header line skipped (`ignoreFirstLine`,
  * flink-project/src/main/java/org/apache/flink/KMeans.java:73-77,138-142);
  * CSV sinks are single-file, header-less, overwrite (KMeans.java:132,231-233).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The `events` table has shipped `ts` in two physical encodings across
    * driver generations: int64 nanosecond timestamps (readable only via
    * the nanosAsLong legacy conf) and plain `timestamp[us]` (arriving as
    * TIMESTAMP_NTZ). Normalize both to microsecond TIMESTAMP: nanos
    * convert with exact integral division (a double roundtrip would lose
    * precision — nanos-since-epoch ≈ 1.7e18 > 2^53), NTZ wall-clock is
    * interpreted as UTC (the session timezone), which is bit-identical
    * to the nanos→micros epoch path on the same data. DuckDB reads both
    * encodings to the same microsecond values. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      // NTZ→LTZ cast is wall-clock-preserving only under the UTC
      // session timezone every entry point pins; any other physical
      // type is a fixture-contract violation — fail loudly rather
      // than cast with timezone-dependent semantics.
      case org.apache.spark.sql.types.TimestampNTZType =>
        require(df.sparkSession.conf.get("spark.sql.session.timeZone") == "UTC",
          "NTZ ts normalization requires spark.sql.session.timeZone=UTC")
        df.withColumn("ts", col("ts").cast("timestamp"))
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported physical type $other; " +
          "expected TIMESTAMP, TIMESTAMP_NTZ, or epoch-nanos BIGINT")
    }

  // ---------------------------------------------------------------------
  // Points relation derived from lineitem (FIXTURES.md §2).
  // pid is a radix-packed key over the unique lineitem natural key
  // (l_orderkey, l_linenumber, l_partkey, l_suppkey) — (orderkey,
  // linenumber) alone is NOT unique in this synthetic data. The packing is
  // overflow-safe in int64 to ~sf10000 and computes identically in Spark
  // and DuckDB (pure int64 arithmetic). (orderkey, linenumber) is already
  // the lineitem natural key, so one partkey term is diversity, not
  // uniqueness. r16: the previous packing carried a second ·1e5·suppkey
  // term whose product exceeded 2^63 at sf10's 15M orderkeys — every
  // points-family query threw ARITHMETIC_OVERFLOW there (the
  // "overflow-safe up to ~sf10" claim was wrong at exactly sf10).
  // ---------------------------------------------------------------------
  val pidExpr: Column =
    (col("l_orderkey") * 10L + col("l_linenumber")) * 1000000L +
      col("l_partkey")

  val pointsSqlBody: String =
    "SELECT (l_orderkey*10 + l_linenumber)*1000000 + l_partkey AS pid, " +
      "l_extendedprice AS x, l_quantity AS y FROM lineitem"

  /** The shared 2-D points relation: (pid: long, x: double, y: double). */
  def points(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select(pidExpr.as("pid"), col("l_extendedprice").as("x"), col("l_quantity").as("y"))

  /** Deterministic initial centroids: the k lowest-pid points, cid = rank.
    * Uses takeOrdered-style `orderBy(pid).limit(k)` (top-k per partition,
    * no global sort/shuffle) then builds a tiny in-memory relation —
    * reference O3 `env.fromCollection` (KMeans.java:120).
    *
    * Memoized per (dir, k): the init set is a pure function of the
    * immutable testdata, and many registered queries compose it — like
    * the reference computing its broadcast init once per job, the top-k
    * scan should run once per process, not once per downstream query. */
  def initCentroids(spark: SparkSession, dir: String, k: Int = 8): Seq[kmeans.Cent] =
    centsMemo.computeIfAbsent((dir, k), { _ =>
      // Order by the full (pid, x, y) identity, not pid alone: pid is a
      // natural-key packing the fixture does not guarantee unique, and a
      // pid tie inside the k lowest rows would make the init set (and
      // every downstream fit) engine- and run-nondeterministic.
      val rows = points(spark, dir).orderBy("pid", "x", "y").limit(k).collect()
      rows.sortBy(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .zipWithIndex.map { case (r, i) =>
          kmeans.Cent(i, r.getDouble(1), r.getDouble(2))
        }.toSeq
    })

  private val centsMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Seq[kmeans.Cent]]()

  def centroidsDF(spark: SparkSession, cents: Seq[kmeans.Cent]): DataFrame = {
    import spark.implicits._
    cents.toDF("cid", "x", "y")
  }

  def centsNDDF(spark: SparkSession, cents: Seq[kmeans.KMeansND.CentND]): DataFrame = {
    import spark.implicits._
    cents.map(c => (c.cid, c.vec)).toDF("cid", "cvec")
  }

  /** `WITH ptsnd AS (...), centsnd AS (...) <tail>` scaffold for the
    * n-dim k-means twins over the embeddings table. */
  def withVecsCents(tail: String, k: Int = 8): String =
    s"""WITH ptsnd AS (SELECT vec_id AS id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
       |  FROM embeddings),
       |centsnd AS (SELECT CAST(rn - 1 AS INT) AS cid, vec AS cvec FROM
       |  (SELECT vec, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM ptsnd) t
       |  WHERE rn <= $k)
       |$tail""".stripMargin

  def centsSqlBody(k: Int): String =
    s"SELECT CAST(rn - 1 AS INT) AS cid, x, y FROM " +
      s"(SELECT x, y, ROW_NUMBER() OVER (ORDER BY pid, x, y) AS rn FROM pts) t WHERE rn <= $k"

  /** `WITH pts AS (...), cents AS (...) <tail>` oracle-SQL scaffold. */
  def withPtsCents(tail: String, k: Int = 8): String =
    s"WITH pts AS ($pointsSqlBody), cents AS (${centsSqlBody(k)}) $tail"

  // ---------------------------------------------------------------------
  // Reference-parity CSV IO (O1, O2, O15)
  // ---------------------------------------------------------------------
  val pointsCsvSchema: StructType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))

  val centroidsCsvSchema: StructType = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))

  /** O1 — CSV points scan; header=true reproduces `ignoreFirstLine`
    * (KMeans.java:74): line 1 is skipped, never interpreted. */
  def pointsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(pointsCsvSchema).option("header", true).csv(path)

  /** O2 — CSV centroids scan (KMeans.java:138-142). */
  def centroidsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(centroidsCsvSchema).option("header", true).csv(path)

  /** O15 — single-file, header-less, overwrite CSV sink
    * (KMeans.java:231-233, `setParallelism(1)` + WriteMode.OVERWRITE). */
  def writeCsvSingle(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", false).csv(path)

  /** O15∘O1 composed for the oracle gate: single-file header-less CSV
    * write, then a positional-schema read-back of the same directory.
    * Spark's CSV writer emits shortest-roundtrip doubles
    * (`Double.toString` → `Double.parseDouble` is value-exact by spec),
    * so the round trip preserves every numeric bit and the read-back
    * hashes identically to the original relation (csv_roundtrip /
    * csv_rt_cents in CORRECTNESS). */
  def csvRoundtrip(df: DataFrame, path: String): DataFrame = {
    writeCsvSingle(df, path)
    df.sparkSession.read.schema(df.schema).option("header", false).csv(path)
  }

  /** JSONL (newline-delimited JSON) sink ∘ scan — the de-facto LLM
    * corpus interchange format. Shards write in parallel (one .json
    * part per partition); the read-back uses an explicit schema —
    * schema INFERENCE is a full extra pass over the data and is never
    * acceptable at 100 TB. Spark's JSON writer escapes control chars,
    * quotes, and newlines per RFC 8259 and emits shortest-roundtrip
    * numerics, so arbitrary document text round-trips value-exact and
    * the read-back hashes identically to the source relation. */
  def jsonlRoundtrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").json(path)
    df.sparkSession.read.schema(df.schema).json(path)
  }

  /** ORC sink ∘ scan — the second columnar lake format. Same contract
    * as [[jsonlRoundtrip]]: sharded parallel write, explicit-schema
    * read-back (never inference), value-exact round trip — ORC stores
    * typed primitives, so doubles/longs/strings hash back identically
    * to the source relation. */
  def orcRoundtrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").orc(path)
    df.sparkSession.read.schema(df.schema).orc(path)
  }

  /** O16 — collect-print sink (KMeans.java:143,243-245: `.print()` when
    * no output paths are given). */
  def printSink(df: DataFrame, numRows: Int = 100): Unit =
    df.show(numRows, truncate = false)

  /** Bucketed managed-table write: rows hash-partitioned into
    * `numBuckets` files per partition by `cols`, sorted within buckets.
    * Two tables bucketed the same way co-locate: joins/aggregations on
    * the bucket key plan with ZERO Exchange (verified in
    * BucketingSpec) — the pre-shuffle strategy for repeated 100 TB
    * joins, paying the shuffle once at write time. */
  def writeBucketed(
      df: DataFrame, table: String, cols: Seq[String], numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
}
