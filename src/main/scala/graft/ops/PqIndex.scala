package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kmeans.KMeansND
import graft.kmeans.KMeansND.CentND

/** Product quantization (Jégou et al. 2011) — the compressed-domain ANN
  * companion to [[IvfIndex]]: split the d-dim vector into `m` subspaces,
  * k-means each subspace into `nlist` codewords, store each vector as m
  * small codes (d·4 bytes → m bytes at nlist ≤ 256), and answer queries
  * by asymmetric distance (ADC): the query stays exact, each database
  * vector is approximated by its per-subspace codewords, and the
  * approximate squared distance is the fixed-order sum of per-subspace
  * codeword distances.
  *
  * 100 TB posture: the codebooks are m·nlist·(d/m) doubles — driver
  * sized at any corpus scale; encoding is m broadcast-argmin aggregates
  * sharing the id partitioning; a query rescore touches only the m-byte
  * codes (the raw vectors never reload), and the final top-k is
  * TakeOrderedAndProject. The registered `pq_topk` uses fixed-iteration
  * codebook training (`convergence = false`), which makes the ENTIRE
  * train→encode→ADC→top-k pipeline DuckDB-unrollable — the same recipe
  * that put `ivf_topk` under the hash-exact oracle gate.
  */
object PqIndex {

  case class Codebooks(m: Int, subDim: Int, books: Seq[Seq[CentND]])

  private def subVec(s: Int, subDim: Int) =
    slice(col("vec"), s * subDim + 1, subDim)

  /** Train per-subspace codebooks with exactly `maxIter` Lloyd steps
    * from the k lowest-id sub-vectors (deterministic, unrollable). */
  def train(vecs: DataFrame, m: Int, nlist: Int, maxIter: Int): Codebooks = {
    val dim = vecs.select(size(col("vec"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val books = (0 until m).map { s =>
      val sub = vecs.select(col("id"), subVec(s, subDim).as("vec"))
      val init = KMeansND.initFromLowestIds(sub, nlist)
      KMeansND.fit(sub, init, maxIter, tol = 0.0, convergence = false)._1
    }
    Codebooks(m, subDim, books)
  }

  /** Encode: per subspace, nearest-codeword id — m broadcast argmin
    * assignments joined back on id → (id, code0 … code{m-1}). */
  def encode(vecs: DataFrame, cb: Codebooks): DataFrame = {
    val spark = vecs.sparkSession
    (0 until cb.m).foldLeft(vecs.select("id")) { (acc, s) =>
      val sub = vecs.select(col("id"), subVec(s, cb.subDim).as("vec"))
      val codes = KMeansND.assign(sub, graft.Tables.centsNDDF(spark, cb.books(s)))
        .select(col("id"), col("cid").as(s"code$s"))
      acc.join(codes, "id")
    }
  }

  /** ADC top-k: query = the `queryId` vector (kept exact, in-plan); the
    * per-subspace codeword distances come from broadcast codebook joins
    * and the total folds in a fixed left-to-right order (bit-stable). */
  def pqTopK(embs: DataFrame, m: Int = 4, nlist: Int = 16, maxIter: Int = 3,
      queryId: Long = 0L, k: Int = 10): DataFrame = {
    val spark = embs.sparkSession
    val vecs = IvfIndex.vectors(embs)
    val cb = train(vecs, m, nlist, maxIter)
    val codes = encode(vecs, cb)
    val q = vecs.filter(col("id") === queryId).select(col("vec").as("qvec"))
    val scored = (0 until cb.m).foldLeft(codes.crossJoin(broadcast(q))) {
      (acc, s) =>
        val book = graft.Tables.centsNDDF(spark, cb.books(s))
          .select(col("cid").as(s"code$s"), col("cvec").as(s"cvec$s"))
        acc.join(broadcast(book), s"code$s")
          .withColumn(s"adc$s", KMeansND.sqDistND(
            slice(col("qvec"), s * cb.subDim + 1, cb.subDim), col(s"cvec$s")))
    }
    val total = (0 until cb.m).map(s => col(s"adc$s")).reduceLeft(_ + _)
    scored.select(col("id"), total.as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("id").asc)
      .limit(k)
  }

  /** Persist the PQ index: the m-byte-per-vector codes table (the only
    * thing a query rescore ever reads — the raw vectors stay cold) and
    * the driver-sized codebooks beside it. At 100 TB the codes table is
    * ~m/(4·d) of the vector data (1/64 here) — the whole point of PQ. */
  def writeIndex(vecs: DataFrame, cb: Codebooks, path: String): Unit = {
    encode(vecs, cb).write.mode("overwrite").parquet(s"$path/codes")
    val spark = vecs.sparkSession
    import spark.implicits._
    cb.books.zipWithIndex
      .flatMap { case (book, s) => book.map(c => (s, c.cid, c.vec)) }
      .toDF("subspace", "cid", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/books")
  }

  def readCodebooks(spark: SparkSession, path: String): Codebooks = {
    val rows = spark.read.parquet(s"$path/books").collect()
    val books = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map {
      case (_, rs) =>
        rs.sortBy(_.getInt(1)).map(r => CentND(r.getInt(1), r.getSeq[Double](2))).toSeq
    }
    Codebooks(books.length, books.head.head.vec.length, books)
  }

  /** ADC top-k over a persisted index: reads ONLY the codes table.
    * Same arithmetic as [[pqTopK]]'s tail, so a fixed-iteration build's
    * probe shares pqTopKSql as its oracle (the parquet round-trip is
    * exact for ints and doubles). */
  def searchIndex(spark: SparkSession, path: String, query: Seq[Double],
      k: Int = 10): DataFrame = {
    val cb = readCodebooks(spark, path)
    val codes = spark.read.parquet(s"$path/codes")
    val qvec = array(query.map(lit): _*)
    val scored = (0 until cb.m).foldLeft(codes) { (acc, s) =>
      val book = graft.Tables.centsNDDF(spark, cb.books(s))
        .select(col("cid").as(s"code$s"), col("cvec").as(s"cvec$s"))
      acc.join(broadcast(book), s"code$s")
        .withColumn(s"adc$s", KMeansND.sqDistND(
          slice(qvec, s * cb.subDim + 1, cb.subDim), col(s"cvec$s")))
    }
    val total = (0 until cb.m).map(s => col(s"adc$s")).reduceLeft(_ + _)
    scored.select(col("id"), total.as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("id").asc)
      .limit(k)
  }

  /** DuckDB twin: per subspace, the sliced relation, `maxIter` unrolled
    * decimal-exact Lloyd steps, final code assignment; then the ADC join
    * with the identical left-to-right subspace fold. */
  def pqTopKSql(m: Int = 4, nlist: Int = 16, maxIter: Int = 3,
      queryId: Long = 0L, k: Int = 10, dim: Int = 64): String = {
    require(dim % m == 0)
    val subDim = dim / m
    val perSub = (0 until m).map { s =>
      val lo = s * subDim + 1
      val hi = s * subDim + subDim
      val sub = s"sub$s"
      val subRel =
        s"$sub AS (SELECT id, list_slice(vec, $lo, $hi) AS vec FROM ptsnd)"
      val init =
        s"""s${s}c0 AS (SELECT CAST(rn - 1 AS INT) AS cid, vec AS cvec FROM
           |  (SELECT vec, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM $sub) t
           |  WHERE rn <= $nlist)""".stripMargin
      val steps = (1 to maxIter).map { i =>
        s"s${s}a$i AS (${KMeansND.assignSql(sub, s"s${s}c${i - 1}")}), " +
          s"s${s}c$i AS (${KMeansND.recomputeSql(sub, s"s${s}a$i")})"
      }.mkString(", ")
      val codes =
        s"codes$s AS (SELECT id, cid AS code$s FROM (${KMeansND.assignSql(sub, s"s${s}c$maxIter")}) a)"
      s"$subRel, $init, $steps, $codes"
    }.mkString(", ")
    val codeJoin = (1 until m)
      .map(s => s"JOIN codes$s ON codes0.id = codes$s.id").mkString(" ")
    val bookJoin = (0 until m)
      .map(s => s"JOIN s${s}c$maxIter b$s ON codes$s.code$s = b$s.cid").mkString(" ")
    val adc = (0 until m)
      .map(s => KMeansND.sqDistSql(s"list_slice(q.vec, ${s * subDim + 1}, ${s * subDim + subDim})", s"b$s.cvec"))
      .reduceLeft((a, b) => s"($a + $b)")
    graft.Tables.withVecsCents(
      s""", $perSub,
         |q AS (SELECT vec FROM ptsnd WHERE id = $queryId)
         |SELECT codes0.id, $adc AS adc_dist
         |FROM codes0 $codeJoin $bookJoin CROSS JOIN q
         |ORDER BY adc_dist ASC, codes0.id ASC LIMIT $k""".stripMargin,
      nlist)
  }
}
