package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two tiers:
  *   - [[cosineTopK]]: brute-force exact top-k — broadcast the (small) query
  *     set against the full corpus; the reference answer and the baseline.
  *   - [[ivfTopK]]: IVF-style partitioned search — assign every corpus
  *     vector to its nearest coarse centroid once, probe only `nprobe` cells
  *     per query. At 100 TB the corpus-cell assignment is the partitioning
  *     key (each cell is a co-located shard); a query touches nprobe/С of
  *     the data instead of all of it.
  *
  * All math is double-precision column arithmetic in index order (zip_with +
  * aggregate), keeping results deterministic and differential-testable.
  */
object Similarity {

  /** Double-precision dot product of two float arrays, summed in index
    * order (bit-exact reproducible). Higher-order-function form — correct
    * for any length but interpreted, so per-row cost is high. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Codegen'd native dot product (custom Catalyst expression) — the
    * declarative form with kernel-class throughput; identical index-order
    * double arithmetic as [[dot]]/[[dotKernel]]. */
  def dotNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Primitive-array dot in index order with a double accumulator —
    * bit-identical to [[dot]], ~100× its throughput. Used inside the
    * mapPartitions scoring kernels where per-pair cost dominates; column
    * expressions (HOF or unrolled) evaluate interpreted per element and are
    * the wrong tool for all-pairs workloads. */
  @inline def dotKernel(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var k = 0
    while (k < a.length) { d += a(k).toDouble * b(k).toDouble; k += 1 }
    d
  }

  /** Cosine similarity = dot / (‖a‖·‖b‖), all double, via the codegen'd
    * native dot. */
  def cosine(a: Column, b: Column): Column =
    dotNative(a, b) / (sqrt(dotNative(a, a)) * sqrt(dotNative(b, b)))

  /** Exact top-k cosine neighbors for each query vector (self excluded).
    * queries/corpus: (idCol numeric, vecCol). The query set is broadcast
    * (it must fit in executor memory — same contract as any broadcast side)
    * and scored against the corpus in one mapPartitions pass over primitive
    * arrays: no shuffle before the per-query top-k, and the per-pair work
    * is a tight JVM loop instead of an interpreted expression.
    */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qArr = queries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id, v, math.sqrt(dotKernel(v, v))) }
    val bc = spark.sparkContext.broadcast(qArr)
    val scored = corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        rows.flatMap { case (cid, cv) =>
          val cn = math.sqrt(dotKernel(cv, cv))
          bc.value.iterator.collect { case (qid, qv, qn) if qid != cid =>
            (qid, cid, dotKernel(qv, cv) / (qn * cn))
          }
        }
      }.toDF("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .select("query_id", "neighbor_id", "cos")
  }

  /** Nearest-centroid cell id for every vector. Centroids are a small
    * DataFrame (cell, vec) — broadcast; at scale they come from a sampled
    * k-means, here from any deterministic picker.
    */
  def assignCells(vectors: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String, nprobe: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("_d").desc, col("cell"))
    vectors.select(col(idCol), col(vecCol).as("_v"))
      .crossJoin(broadcast(centroids.select(col("cell"), col("_cv"))))
      .withColumn("_d", cosine(col("_v"), col("_cv")))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= nprobe)
      .select(col(idCol), col("cell"))
  }

  /** IVF top-k: corpus sharded by nearest cell (1 cell each), queries probe
    * their `nprobe` nearest cells; exact re-scoring within probed cells.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val corpusCells = assignCells(corpus, centroids, idCol, vecCol, 1)
      .withColumnRenamed(idCol, "neighbor_id")
    val queryCells = assignCells(queries, centroids, idCol, vecCol, nprobe)
      .withColumnRenamed(idCol, "query_id")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
        sqrt(dotNative(col(vecCol), col(vecCol))).as("_cn"))
      .join(corpusCells, "neighbor_id")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
        sqrt(dotNative(col(vecCol), col(vecCol))).as("_qn"))
      .join(queryCells, "query_id")
    val scored = q.join(c, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dotNative(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .select("query_id", "neighbor_id", "cos")
  }

  /** Embedding near-duplicate pairs: all (i < j) with cosine ≥ minCos.
    * The exact form broadcasts one side (embeddings are narrow); the
    * approximate scale path for huge corpora is [[ivfTopK]]-style cell
    * sharding, which bounds each comparison to co-located cells.
    */
  def cosineNearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
      minCos: Double): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val all = vectors.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id, v, math.sqrt(dotKernel(v, v))) }
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(all)
    vectors.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        rows.flatMap { case (i, va) =>
          val na = math.sqrt(dotKernel(va, va))
          bc.value.iterator.filter(_._1 > i).flatMap { case (j, vb, nb) =>
            val cos = dotKernel(va, vb) / (na * nb)
            if (cos >= minCos) Iterator.single((i, j, cos)) else Iterator.empty
          }
        }
      }.toDF("i", "j", "cos")
  }

  /** Mean recall@k of `approx` against `exact` (both (query_id, neighbor_id)
    * top-k tables). One row: (n_queries, avg_recall).
    */
  def recallAgainst(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("_hits"))
    val perQuery = exact.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .withColumn("_recall", coalesce(col("_hits"), lit(0L)).cast("double") / k)
    perQuery.agg(count(lit(1)).as("n_queries"),
      round(avg(col("_recall")), 4).as("avg_recall"))
  }
}
