package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** SemDeDup scale probe (SURVEY §8): planted near-duplicate groups at the
  * 1 M-vector shape, survivors asserted EXACTLY (one min-id survivor per
  * group, every unique vector kept), plus the cell-skew arm the operator's
  * 100 TB story rests on — the corpus forced into ONE coarse cell, where
  * the block-triangle split is the difference between one task doing the
  * whole cell's quadratic work and g·(g+1)/2 bounded tasks doing it in
  * parallel.
  *
  * Corpus: groups of 20 near-identical vectors (center + ±0.01 jitter,
  * within-group cosine ≈ 0.9999). A center is signed hash noise in
  * [−1, 1]³² plus a 3.0 spike at dim (group mod nlist) — the spike pins
  * the cell assignment (jitter cannot flip an argmax led by 3.0 vs ≤ 1),
  * and two different centers' cosine concentrates far below the 0.995
  * threshold (near-parallel 32-dim signed noise is the only way up, and
  * the draw is content-deterministic — the probe is reproducible, not
  * flaky).
  *
  * `SPARK_GRAFT_SEMDEDUP_N` scales (default 200000; 1000000 for the 10×
  * probe). */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("SPARK_GRAFT_SEMDEDUP_N", "200000").toLong
    val dim = 32; val nlist = 16; val minCos = 0.995

    // signed noise component in [-1, 1] from (key, j) — content-hash
    // deterministic, like every fixture generator in the probe family
    def noise(key: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =
      pmod(hash(key, j), lit(2001)).cast("float") / 1000f - 1f
    // group center + per-member jitter; `spike` pins the coarse cell
    def vectors(rows: DataFrame, spike: org.apache.spark.sql.Column): DataFrame =
      rows.select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), j =>
          (noise(floor(col("id") / 20L).cast("long"), j)
            + when(j === spike, lit(3.0f)).otherwise(lit(0.0f))
            + noise(col("id"), j + dim) / 100f).cast("float")).as("embedding"))

    val cents = spark.range(nlist).select(col("id").as("cell"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        when(j === col("id").cast("int"), lit(1.0f)).otherwise(lit(0.0f)))
        .as("_cv")).localCheckpoint(true)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def survivorsOk(kept: Array[Long], total: Long): Boolean = {
      val groups = total / 20
      // exactly one survivor per group, and it is the group's min id
      kept.length == groups && kept.forall(_ % 20 == 0) &&
        kept.map(_ / 20).distinct.length == groups
    }

    // ARM 1: groups spread across all 16 cells (the healthy shape);
    // default block sizing (cells of n/16 rows → g = ceil(rows/65536))
    val spread = vectors(spark.range(n).toDF("id"),
      pmod(floor(col("id") / 20L).cast("long"), lit(nlist.toLong)).cast("int"))
      .localCheckpoint(true)
    val (k1, w1) = timed(Similarity.semDedup(spread, cents, "vec_id",
      "embedding", minCos).select("vec_id").collect().map(_.getLong(0)))
    val ok1 = survivorsOk(k1, n)

    // ARM 2: same corpus, blocks forced small — the pair set and the
    // survivor set must not move when the parallelism knob does
    val (k2, w2) = timed(Similarity.semDedup(spread, cents, "vec_id",
        "embedding", minCos, maxRowsPerBlock = 16384)
      .select("vec_id").collect().map(_.getLong(0)))
    val ok2 = k2.sorted.sameElements(k1.sorted)

    // ARM 3: the skew story — every vector spiked into CELL 0 (a corpus
    // whose quantizer degenerated), at n/10 so the inherent quadratic
    // stays runnable. numBlocksPerCell = 1 is the naive plan (ONE task
    // owns the whole cell's quadratic work + all its vectors); the
    // default split bounds per-task rows and spreads the same work over
    // g·(g+1)/2 tasks. Same survivors both ways.
    val nSkew = math.max(20L, n / 10)
    val skew = vectors(spark.range(nSkew).toDF("id"), lit(0))
      .localCheckpoint(true)
    val (k3, w3) = timed(Similarity.semDedup(skew, cents, "vec_id",
        "embedding", minCos, numBlocksPerCell = 1)
      .select("vec_id").collect().map(_.getLong(0)))
    val (k4, w4) = timed(Similarity.semDedup(skew, cents, "vec_id",
        "embedding", minCos, maxRowsPerBlock = 16384)
      .select("vec_id").collect().map(_.getLong(0)))
    val ok3 = survivorsOk(k3, nSkew) && k4.sorted.sameElements(k3.sorted)

    val ok = ok1 && ok2 && ok3
    println(f"SEMDEDUP n=$n groups=${n / 20} " +
      f"wallSpread=$w1%.1fs wallSpreadSplit=$w2%.1fs " +
      f"skewN=$nSkew wallOneTask=$w3%.1fs wallSplit=$w4%.1fs " +
      f"exactSpread=$ok1 splitInvariant=$ok2 exactSkew=$ok3 " +
      s"${if (ok) "OK" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
