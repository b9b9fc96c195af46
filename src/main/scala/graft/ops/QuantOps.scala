package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compressed-vector ANN variants over the `embeddings` table — the
  * three standard memory/recall points between brute-force float and
  * PQ (PqIndex.scala):
  *
  *   - SQ8 scalar quantization (FAISS IndexScalarQuantizer): one byte
  *     per dimension, per-dim affine [lo,hi] grid — 4× smaller than
  *     float32 with near-exact recall.
  *   - Binary sign hashing (Charikar SimHash for vectors): one BIT per
  *     dimension, Hamming distance via popcount — 32× smaller, the
  *     cheapest shortlist stage.
  *   - Matryoshka prefix-dim search (Kusupati et al. 2022): score on
  *     the first dPrefix dims (MRL-style nested embedding), exact
  *     re-rank of a shortlist at full dimension.
  *
  * Determinism contract (same as EmbeddingOps): every dot/norm is a
  * left-to-right fold; quantizer grid params (lo/scale/inv per dim) are
  * driver-collected corpus min/max — d tiny rows — shipped as literal
  * arrays, with IEEE-identical arithmetic replayed by the DuckDB twins.
  * round() on non-negative operands is half-up in both engines.
  *
  * 100 TB posture: encode and scoring are zero-shuffle projections (the
  * stats agg is one d-row reduce); top-k compiles to
  * TakeOrderedAndProject (per-partition heads, k rows to the driver —
  * never a global sort). The codes relation is the persistable
  * artifact: 1 byte/dim (SQ8) or 2 words/vector (binary) instead of
  * 4 bytes/dim, so the probe scan reads 4-32× fewer bytes.
  */
object QuantOps {

  /** Per-dim corpus (lo, hi) — the SQ8 grid, driver-sized (d rows). */
  private def dimStats(embs: DataFrame, dim: Int): (Array[Double], Array[Double]) = {
    val rows = embs.select(posexplode(col("embedding"))).toDF("pos", "v")
      .groupBy("pos").agg(min("v").as("lo"), max("v").as("hi"))
      .collect()
    // Validate the observed dimensionality against the declared one: a
    // longer embedding would index past the grid arrays; a shorter one
    // would leave lo/hi at 0.0 and silently mis-calibrate the grid.
    require(rows.nonEmpty, "dimStats: embeddings relation is empty")
    val maxPos = rows.iterator.map(_.getInt(0)).max
    require(maxPos == dim - 1,
      s"dimStats: embeddings span ${maxPos + 1} dims, expected $dim")
    val lo = new Array[Double](dim); val hi = new Array[Double](dim)
    rows.foreach { r =>
      lo(r.getInt(0)) = r.getFloat(1).toDouble
      hi(r.getInt(0)) = r.getFloat(2).toDouble
    }
    (lo, hi)
  }

  private def litArr(a: Array[Double]) = array(a.toIndexedSeq.map(lit): _*)

  /** (vec_id, codes array<int>) — the persisted-form SQ8 relation.
    * The grid arrays are bound ONCE as columns so each 64-element
    * literal appears a single time in the plan instead of once per
    * element access (64× smaller expression tree → faster codegen). */
  def sq8Codes(embs: DataFrame, dim: Int = 64): DataFrame = {
    val (lo, hi) = dimStats(embs, dim)
    val scale = lo.indices.map(i =>
      if (hi(i) == lo(i)) 0.0 else 255.0 / (hi(i) - lo(i))).toArray
    embs.withColumn("__lo", litArr(lo)).withColumn("__s", litArr(scale))
      .select(col("vec_id"),
        transform(sequence(lit(1), lit(dim)), i =>
          round((element_at(col("embedding"), i).cast("double")
            - element_at(col("__lo"), i)) * element_at(col("__s"), i))
            .cast("int")).as("codes"))
  }

  /** Persist the SQ8 index: the codes relation (1 byte/dim of info,
    * int-typed) plus the d-row grid (lo, inv per dim) the probe needs
    * to decode. The raw vectors are read exactly once, at build. */
  def writeSq8Index(embs: DataFrame, path: String, dim: Int = 64): Unit = {
    val (lo, hi) = dimStats(embs, dim)
    val inv = lo.indices.map(i =>
      if (hi(i) == lo(i)) 0.0 else (hi(i) - lo(i)) / 255.0).toArray
    sq8Codes(embs, dim).write.mode("overwrite").parquet(s"$path/codes")
    val spark = embs.sparkSession
    import spark.implicits._
    lo.indices.map(i => (i, lo(i), inv(i))).toDF("i", "lo", "inv")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/grid")
  }

  /** SQ8 probe over a persisted index: reads ONLY the codes table
    * (plus the d-row grid, driver-collected like the PQ codebooks) —
    * the production path whose scan is ~4× smaller than the raw
    * vectors. decode_i = lo_i + code_i · inv_i is the identical
    * value path as [[sq8TopK]]'s fused quantize∘decode (round∘scale of
    * the same doubles), so a fixed corpus probe shares sq8TopKSql as
    * its oracle through the exact int/double parquet round-trip. */
  def searchSq8Index(spark: SparkSession, path: String,
      query: Seq[Double], queryId: Long = 0L, k: Int = 10): DataFrame = {
    val grid = spark.read.parquet(s"$path/grid").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val lo = grid.map(_._2); val inv = grid.map(_._3)
    val dim = grid.length
    val codes = spark.read.parquet(s"$path/codes")
    val qvec = array(query.map(lit): _*)
    val qnorm = math.sqrt(query.foldLeft(0.0)((a, v) => a + v * v))
    codes.filter(col("vec_id") =!= queryId)
      .withColumn("__lo", litArr(lo)).withColumn("__inv", litArr(inv))
      .select(col("vec_id"),
        transform(sequence(lit(1), lit(dim)), i =>
          element_at(col("__lo"), i)
            + element_at(col("codes"), i) * element_at(col("__inv"), i))
          .as("dvec"))
      .crossJoin(broadcast(
        spark.range(1).select(qvec.as("q_emb"), lit(qnorm).as("q_norm"))))
      .select(col("vec_id"),
        (EmbeddingOps.dot(col("dvec"), col("q_emb"))
          / (EmbeddingOps.l2Norm(col("dvec")) * col("q_norm"))).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc).limit(k)
  }

  /** Asymmetric SQ8 top-k: raw query vector against the decoded grid
    * points of every database vector (encode→decode is the plan here so
    * the whole pipeline is one oracle-checkable query; production
    * persists `sq8Codes` and pays only decode+score per probe). */
  def sq8TopK(embs: DataFrame, queryId: Long = 0L, k: Int = 10,
      dim: Int = 64): DataFrame = {
    val (lo, hi) = dimStats(embs, dim)
    val scale = lo.indices.map(i =>
      if (hi(i) == lo(i)) 0.0 else 255.0 / (hi(i) - lo(i))).toArray
    val inv = lo.indices.map(i =>
      if (hi(i) == lo(i)) 0.0 else (hi(i) - lo(i)) / 255.0).toArray
    // quantize∘decode fused into ONE transform lambda:
    // dvec_i = lo_i + round((e_i - lo_i)·s_i)::int · inv_i. Two stacked
    // transforms (codes, then dec reading element_at(codes, i)) get
    // CollapseProject-inlined — the WHOLE 64-element codes array then
    // re-evaluates per lambda index, 64× recompute in interpreted
    // (non-codegen) higher-order-function eval: measured 41.7 s at sf1
    // for 20 k rows vs ~1 s for the flat shape. Same int-cast value
    // path, so the oracle compare is untouched.
    val dec = embs
      .withColumn("__lo", litArr(lo)).withColumn("__s", litArr(scale))
      .withColumn("__inv", litArr(inv))
      .select(col("vec_id"),
        transform(sequence(lit(1), lit(dim)), i =>
          element_at(col("__lo"), i)
            + round((element_at(col("embedding"), i).cast("double")
                - element_at(col("__lo"), i)) * element_at(col("__s"), i))
              .cast("int") * element_at(col("__inv"), i)).as("dvec"))
    val q = embs.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"),
        EmbeddingOps.l2Norm(col("embedding")).as("q_norm"))
    dec.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (EmbeddingOps.dot(col("dvec"), col("q_emb"))
          / (EmbeddingOps.l2Norm(col("dvec")) * col("q_norm"))).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc).limit(k)
  }

  def sq8TopKSql(queryId: Long = 0L, k: Int = 10, dim: Int = 64): String = {
    import EmbeddingOps.dotSql
    s"""WITH stats AS (
       |  SELECT i, CAST(MIN(embedding[i]) AS DOUBLE) AS lo,
       |         CAST(MAX(embedding[i]) AS DOUBLE) AS hi
       |  FROM embeddings, generate_series(1, $dim) AS t(i) GROUP BY i),
       |grid AS (SELECT
       |    list(lo ORDER BY i) AS lo,
       |    list(CASE WHEN hi = lo THEN 0.0 ELSE 255.0 / (hi - lo) END
       |         ORDER BY i) AS s,
       |    list(CASE WHEN hi = lo THEN 0.0 ELSE (hi - lo) / 255.0 END
       |         ORDER BY i) AS inv
       |  FROM stats),
       |codes AS (SELECT e.vec_id,
       |    list_transform(generate_series(1, $dim), i ->
       |      CAST(round((CAST(e.embedding[i] AS DOUBLE) - g.lo[i]) * g.s[i])
       |           AS INT)) AS codes
       |  FROM embeddings e CROSS JOIN grid g),
       |dec AS (SELECT c.vec_id,
       |    list_transform(generate_series(1, $dim), i ->
       |      g.lo[i] + c.codes[i] * g.inv[i]) AS dvec
       |  FROM codes c CROSS JOIN grid g),
       |q AS (SELECT embedding AS q_emb,
       |    SQRT(${dotSql("embedding", "embedding")}) AS q_norm
       |  FROM embeddings WHERE vec_id = $queryId),
       |scored AS (SELECT d.vec_id,
       |    ${dotSql("d.dvec", "q.q_emb")}
       |      / (SQRT(${dotSql("d.dvec", "d.dvec")}) * q.q_norm) AS cosine
       |  FROM dec d CROSS JOIN q WHERE d.vec_id <> $queryId)
       |SELECT vec_id, cosine FROM (
       |  SELECT vec_id, cosine,
       |    ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id ASC) AS rn
       |  FROM scored) s WHERE rn <= $k""".stripMargin
  }

  /** Sign-bit words: bit i-1 of word w set iff embedding[(w-1)*32+i]
    * >= 0 — two 32-bit-packed BIGINTs for the 64-dim table. */
  private def signWord(emb: org.apache.spark.sql.Column, offset: Int) =
    (1 to 32).map(i =>
      when(element_at(emb, offset + i) >= 0, lit(1L << (i - 1)))
        .otherwise(lit(0L))).reduce(_ + _)

  /** Binary-hash Hamming top-k: vectors ranked by popcount distance
    * between their sign signatures and the query's. The 64-dim float
    * vector collapses to TWO longs — the 32×-compressed shortlist
    * representation (score(x,q) ~ cos angle via Hamming, Charikar'02). */
  def hammingTopK(embs: DataFrame, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val sig = embs.select(col("vec_id"),
      signWord(col("embedding"), 0).as("w0"),
      signWord(col("embedding"), 32).as("w1"))
    val q = sig.filter(col("vec_id") === queryId)
      .select(col("w0").as("qw0"), col("w1").as("qw1"))
    sig.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (bit_count(col("w0").bitwiseXOR(col("qw0")))
          + bit_count(col("w1").bitwiseXOR(col("qw1")))).cast("int").as("hamming"))
      .orderBy(col("hamming").asc, col("vec_id").asc).limit(k)
  }

  def hammingTopKSql(queryId: Long = 0L, k: Int = 10): String = {
    def word(offset: Int) =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(generate_series(1, 32), i ->
         |        CASE WHEN embedding[$offset + i] >= 0
         |             THEN CAST(1 AS BIGINT) << (i - 1)
         |             ELSE CAST(0 AS BIGINT) END)),
         |      (a, b) -> a + b)""".stripMargin
    s"""WITH sig AS (SELECT vec_id,
       |    ${word(0)} AS w0,
       |    ${word(32)} AS w1
       |  FROM embeddings),
       |q AS (SELECT w0 AS qw0, w1 AS qw1 FROM sig WHERE vec_id = $queryId),
       |scored AS (SELECT s.vec_id,
       |    CAST(bit_count(xor(s.w0, q.qw0)) + bit_count(xor(s.w1, q.qw1))
       |         AS INT) AS hamming
       |  FROM sig s CROSS JOIN q WHERE s.vec_id <> $queryId)
       |SELECT vec_id, hamming FROM (
       |  SELECT vec_id, hamming,
       |    ROW_NUMBER() OVER (ORDER BY hamming ASC, vec_id ASC) AS rn
       |  FROM scored) s WHERE rn <= $k""".stripMargin
  }

  /** Matryoshka two-stage search: cosine over the first `dPrefix` dims
    * shortlists `shortlist` candidates (a dPrefix/dim-cost scan), exact
    * full-dim cosine re-ranks them to the final k. Both stages are
    * TakeOrderedAndProject; the re-rank joins the shortlist (tiny,
    * broadcast) back to the full vectors. */
  def matryoshkaTopK(embs: DataFrame, queryId: Long = 0L, k: Int = 10,
      dPrefix: Int = 16, shortlist: Int = 40): DataFrame = {
    val pre = (c: org.apache.spark.sql.Column) => slice(c, 1, dPrefix)
    val q = embs.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"),
        EmbeddingOps.l2Norm(col("embedding")).as("q_norm"),
        EmbeddingOps.l2Norm(pre(col("embedding"))).as("qp_norm"))
    val short = embs.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (EmbeddingOps.dot(pre(col("embedding")), pre(col("q_emb")))
          / (EmbeddingOps.l2Norm(pre(col("embedding"))) * col("qp_norm")))
          .as("pre_cos"))
      .orderBy(col("pre_cos").desc, col("vec_id").asc).limit(shortlist)
    embs.join(broadcast(short.select("vec_id")), Seq("vec_id"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (EmbeddingOps.dot(col("embedding"), col("q_emb"))
          / (EmbeddingOps.l2Norm(col("embedding")) * col("q_norm"))).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc).limit(k)
  }

  def matryoshkaTopKSql(queryId: Long = 0L, k: Int = 10,
      dPrefix: Int = 16, shortlist: Int = 40): String = {
    import EmbeddingOps.dotSql
    def preSql(e: String) = s"list_slice($e, 1, $dPrefix)"
    s"""WITH q AS (SELECT embedding AS q_emb,
       |    SQRT(${dotSql("embedding", "embedding")}) AS q_norm,
       |    SQRT(${dotSql(preSql("embedding"), preSql("embedding"))}) AS qp_norm
       |  FROM embeddings WHERE vec_id = $queryId),
       |pre AS (SELECT e.vec_id,
       |    ${dotSql(preSql("e.embedding"), preSql("q.q_emb"))}
       |      / (SQRT(${dotSql(preSql("e.embedding"), preSql("e.embedding"))})
       |         * q.qp_norm) AS pre_cos
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> $queryId),
       |short AS (SELECT vec_id FROM (
       |    SELECT vec_id, ROW_NUMBER() OVER
       |      (ORDER BY pre_cos DESC, vec_id ASC) AS rn
       |    FROM pre) p WHERE rn <= $shortlist),
       |scored AS (SELECT e.vec_id,
       |    ${dotSql("e.embedding", "q.q_emb")}
       |      / (SQRT(${dotSql("e.embedding", "e.embedding")}) * q.q_norm) AS cosine
       |  FROM embeddings e JOIN short s ON e.vec_id = s.vec_id CROSS JOIN q)
       |SELECT vec_id, cosine FROM (
       |  SELECT vec_id, cosine,
       |    ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id ASC) AS rn
       |  FROM scored) s WHERE rn <= $k""".stripMargin
  }
}
