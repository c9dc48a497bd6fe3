package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (SURVEY.md §2.D).
  *
  * Scale design: the query set is broadcast (one pass over the vector
  * corpus, no shuffle of the big side); cosine is a codegen'd
  * zip_with+aggregate fold (no UDF). The LSH variant buckets vectors by
  * random-hyperplane signatures so a probe touches ~1/2^planes of the
  * corpus — that is the 100 TB path; brute force is the exactness
  * baseline at any scale where a full pass is acceptable.
  */
object VectorOps {

  /** Strict left-fold dot product — bit-identical to the DuckDB oracle's
    * list_reduce (IEEE addition in the same order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Composable (higher-order-function) cosine — interpreted; kept as
    * the portable fallback and as the semantics reference. */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Native codegen'd cosine (graft.functions.CosineSimilarity via
    * GraftExtensions) — bit-identical to cosineHof, ~10× cheaper. */
  def cosine(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  val NumQueries = 10
  val TopK = 5

  /** d9: brute-force cosine top-k — queries (vec_id < 10) broadcast
    * against all other vectors, per-query top-5. */
  def d9CosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val cand = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).join(cand, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qe"), col("ne")).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  val d9Sql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id AS neighbor_id, embedding AS ne FROM embeddings),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |    list_reduce(list_transform(range(1, 65), i -> CAST(qe[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)), (x, y) -> x + y)
      |    / (sqrt(list_reduce(list_transform(range(1, 65), i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), (x, y) -> x + y))
      |       * sqrt(list_reduce(list_transform(range(1, 65), i -> CAST(ne[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)), (x, y) -> x + y))) AS cos
      |  FROM q JOIN c ON neighbor_id <> query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos,
      |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rnk
      |  FROM scored)
      |SELECT query_id, neighbor_id, cos, rnk FROM ranked WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin

  val NumPlanes = 4

  /** Deterministic ±1 random-hyperplane weights (fixed seed mix). */
  private def planeWeights(p: Int): Seq[Double] =
    (0 until 64).map(j => if ((((p * 73856093) ^ (j * 19349663)) & 0x10000) == 0) 1.0 else -1.0)

  def lshBucket(v: Column): Column =
    (0 until NumPlanes).map { p =>
      val w = array(planeWeights(p).map(lit(_)): _*)
      when(dot(v, w) >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** d10: LSH-bucketed ANN — same output shape as d9, but each query
    * only scores candidates in its hyperplane bucket. Rows-only (recall
    * vs d9 asserted in ScalaTest). */
  def d10AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).withColumn("bucket", lshBucket(col("embedding")))
    val q = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket"))
    val cand = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"), col("bucket").as("cb"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).join(cand, col("bucket") === col("cb") && col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qe"), col("ne")).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  val NumCentroids = 16
  val NumProbes = 4

  /** Deterministic centroid set: the C vectors with the smallest hashed
    * ids — a stable pseudo-random sample (no k-means iterations needed
    * for a bucketing structure; swap in Lloyd refinement offline). */
  private def centroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h"), col("vec_id"))
      .limit(NumCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))

  /** d12: IVF ANN — inverted lists over centroids with multiprobe.
    * Index pass: every vector joins the broadcast centroid set once and
    * lands in its nearest centroid's list (the partition layout at
    * 100 TB). Query pass: each query probes its P nearest lists only —
    * work scales with P/C of the corpus instead of all of it.
    * Rows-only; recall vs d9 asserted in ScalaTest. */
  def d12AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = centroids(spark, dir)
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))
    val assigned = emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("cid"),
        cosine(col("embedding"), col("ce")).as("csim"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"), col("cid"))
    val q = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cent))
      .select(col("query_id"), col("qe"), col("cid"),
        cosine(col("qe"), col("ce")).as("csim"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= NumProbes)
      .select(col("query_id"), col("qe"), col("cid"))
    val wTop = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(probes).join(assigned, Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qe"), col("ne")).as("cos"))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= TopK)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d9_cosine_topk" -> (d9CosineTopk _),
    "d10_ann_lsh" -> (d10AnnLsh _),
    "d12_ann_ivf" -> (d12AnnIvf _))

  val oracles: Map[String, String] = Map(
    "d9_cosine_topk" -> d9Sql)
}
