package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** SQ8-vs-float serving probe (SURVEY §8): the same synthetic corpus as
  * [[IvfIngestProbe]] indexed BOTH ways, the same query batch served from
  * both directories — reports on-disk corpus bytes, serve wall, and the
  * quantized result's recall against the float-IVF serve at identical
  * (k, nprobe). Quantized recall is measured against float-IVF (the same
  * probing) so the number isolates the quantization loss, not the cell
  * probing loss.
  *
  * `SPARK_GRAFT_IVF_BASE` scales (default 200000; 1000000 for the 10×
  * probe). */
object IvfQuantProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("SPARK_GRAFT_IVF_BASE", "200000").toLong
    val dim = 64; val nlist = 16
    val root = java.nio.file.Files.createTempDirectory("graft_ivfquant").toString

    // jitter spans ~50 of the ~255 quantization levels (per-vector range
    // is dominated by the 1.0 one-hot → step ≈ 1/255): realistic
    // embedding texture. The DEGENERATE variant (jitter/50000 ≈ 5 levels,
    // i.e. discriminative signal below quantization noise) was measured
    // too: raw SQ8 recall collapses to 0.42 and even refineFactor=8 only
    // reaches 0.87, because the proposal stage carries no rank signal —
    // the documented reason SQ8 is gated on recall, not exactness, and
    // rescoring cannot rescue a signal-free proposal tier.
    def vectors(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), j =>
          (when(j === (col("id") % nlist).cast("int"), lit(1.0f))
            .otherwise(lit(0.0f))
            + (pmod(hash(col("id"), j), lit(1000)).cast("float") / 5000f)
          ).cast("float")).as("embedding"))

    val corpus = vectors(0, n)
    val queries = vectors(0, 200).localCheckpoint(true)
    Similarity.saveIvfIndex(corpus, "vec_id", "embedding", s"$root/f",
      nlist, sampleFraction = math.min(1.0, 100000.0 / n))
    // same centroids for the quantized index, so the probed cells match
    val cents = Similarity.ivfCentroids(spark, s"$root/f").localCheckpoint(true)
    Similarity.saveIvfIndexQuantized(corpus, "vec_id", "embedding",
      s"$root/q", nlist, centroids = Some(cents))

    def bytes(d: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(s"$d/v1/corpus"))
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (fRes, fS) = timed(Similarity.ivfTopKIndexed(queries, s"$root/f",
      "vec_id", "embedding", k = 10, nprobe = 3)
      .select("query_id", "neighbor_id").localCheckpoint(true))
    val (qRes, qS) = timed(Similarity.ivfTopKQuantized(queries, s"$root/q",
      "vec_id", "embedding", k = 10, nprobe = 3)
      .select("query_id", "neighbor_id").localCheckpoint(true))
    val recall = Similarity.recallAgainst(fRes, qRes, 10).head.getDouble(1)
    // refine: exact rescoring of k·8 candidates recovers the fine rank
    // SQ8 blurs among near-tied neighbors
    val (rRes, rS) = timed(Similarity.ivfTopKQuantizedRefined(queries,
      s"$root/q", corpus, "vec_id", "embedding", k = 10, nprobe = 3,
      refineFactor = 8)
      .select("query_id", "neighbor_id").localCheckpoint(true))
    val recallR = Similarity.recallAgainst(fRes, rRes, 10).head.getDouble(1)
    val ratio = bytes(s"$root/q").toDouble / bytes(s"$root/f")

    // PQ arm — on the corpus shape PQ is FOR. The jitter corpus above is
    // PQ's impossible case (iid noise: top-10 among tens of thousands of
    // near-ties needs fine precision 8 bytes cannot carry — measured at
    // chance, the same honesty class as SQ8's degenerate variant); real
    // embedding spaces CLUSTER, and there PQ's coarse codes suffice.
    // Model: 11-member clusters (query + its 10 true neighbors at
    // cosine ≈ 1, every other cluster far), so exact top-10 = the
    // cluster mates and a coarse tier that separates clusters recalls
    // them. Same-centroid float index on the SAME corpus is the
    // reference, isolating PQ loss from probing loss as above.
    val nClusters = (n / 11).toInt
    val clustered = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        ((pmod(hash((col("id") / 11).cast("long"), j), lit(1000))
            .cast("float") / 1000f)
          + (pmod(hash(col("id"), j, lit(7)), lit(1000)).cast("float")
            / 50000f)).cast("float")).as("embedding"))
    val qc = clustered.filter(col("vec_id") % 11 === 0)
      .limit(200).localCheckpoint(true)
    Similarity.saveIvfIndex(clustered, "vec_id", "embedding", s"$root/f2",
      nlist, sampleFraction = math.min(1.0, 100000.0 / n))
    val cents2 = Similarity.ivfCentroids(spark, s"$root/f2")
      .localCheckpoint(true)
    // codebooks trained on a 20 k sample — standard PQ practice, the
    // training cost must not scale with the corpus
    Similarity.saveIvfIndexPQ(clustered, "vec_id", "embedding",
      s"$root/pq", nlist, pqM = 8, pqK = 256,
      sampleFraction = math.min(1.0, 20000.0 / n), maxIter = 10,
      centroids = Some(cents2))
    val (f2Res, f2S) = timed(Similarity.ivfTopKIndexed(qc, s"$root/f2",
      "vec_id", "embedding", k = 10, nprobe = 3)
      .select("query_id", "neighbor_id").localCheckpoint(true))
    val (pqRes, pqS) = timed(Similarity.ivfTopKPQ(qc, s"$root/pq",
      "vec_id", "embedding", k = 10, nprobe = 3)
      .select("query_id", "neighbor_id").localCheckpoint(true))
    val recallPq = Similarity.recallAgainst(f2Res, pqRes, 10).head.getDouble(1)
    // refineFactor 16 (vs SQ8's 8): PQ's coarser proposals need the
    // wider candidate set — raw recall falls as the cluster count
    // outgrows the fixed 20 k codebook-training sample (0.86 at 200 k →
    // 0.70 at 1 M clusters×5), and rescoring 160 candidates recovers it
    val (prRes, prS) = timed(Similarity.ivfTopKPQRefined(qc,
      s"$root/pq", clustered, "vec_id", "embedding", k = 10, nprobe = 3,
      refineFactor = 16)
      .select("query_id", "neighbor_id").localCheckpoint(true))
    val recallPr = Similarity.recallAgainst(f2Res, prRes, 10).head.getDouble(1)
    val ratioPq = bytes(s"$root/pq").toDouble / bytes(s"$root/f2")
    // RESIDUAL arm (FAISS IVFPQ layout): same centroids, same sample,
    // same bytes — codes quantize v − c(cell). Reported alongside the
    // plain arm: raw recall and the pqIndexStats mean_qerr both ways,
    // tying the drift diagnostic to a measured recall difference.
    Similarity.saveIvfIndexPQ(clustered, "vec_id", "embedding",
      s"$root/pqr", nlist, pqM = 8, pqK = 256,
      sampleFraction = math.min(1.0, 20000.0 / n), maxIter = 10,
      centroids = Some(cents2), residual = true)
    val (qrRes, qrS) = timed(Similarity.ivfTopKPQ(qc, s"$root/pqr",
      "vec_id", "embedding", k = 10, nprobe = 3)
      .select("query_id", "neighbor_id").localCheckpoint(true))
    val recallPqr = Similarity.recallAgainst(f2Res, qrRes, 10).head.getDouble(1)
    // PER-CELL codebook arm (the local-PQ tier): same centroids, same
    // code bytes — quantizer capacity AND training data grow with nlist
    // (each cell trains its own m×k codebooks on ≤ 20 k of ITS residuals)
    // while each k-means stays sample-bounded. The number to beat is the
    // residual arm's raw recall at the identical corpus footprint.
    Similarity.saveIvfIndexPQ(clustered, "vec_id", "embedding",
      s"$root/pql", nlist, pqM = 8, pqK = 256, maxIter = 10,
      centroids = Some(cents2), perCell = true, maxTrainPerCell = 20000)
    val (qlRes, qlS) = timed(Similarity.ivfTopKPQ(qc, s"$root/pql",
      "vec_id", "embedding", k = 10, nprobe = 3)
      .select("query_id", "neighbor_id").localCheckpoint(true))
    val recallPql = Similarity.recallAgainst(f2Res, qlRes, 10).head.getDouble(1)
    def qerr(d: String): Double = Similarity.pqIndexStats(spark, d)
      .filter(col("source") === "base").head.getDouble(2)
    // OPQ-ROTATION arm — on the corpus shape rotation is FOR: cluster
    // centers are ±0.5 bit vectors MIXED across every subspace boundary
    // by 45° Givens turns (dims 7↔8, 15↔16, …), so in the observed space
    // each subspace sees combinations of neighboring bits and shared
    // codebooks waste codes on the mixture; the trained rotation
    // un-mixes, the per-subspace alphabet collapses, and the same 8
    // bytes encode more of the structure. Residual arms both ways, same
    // centroids, same bytes.
    def centerBit(cl: org.apache.spark.sql.Column,
        j: org.apache.spark.sql.Column) =
      (pmod(hash(cl, j, lit(17)), lit(2)).cast("float") - 0.5f)
    val sqh = 0.70710678f
    val mixed = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j => {
        val cl = (col("id") / 11).cast("long")
        val b = centerBit(cl, j)
        val bPrev = centerBit(cl, j - 1)
        val bNext = centerBit(cl, j + 1)
        val mixedBit =
          when(pmod(j, lit(8)) === 7, (b - bNext) * sqh)
            .when(pmod(j, lit(8)) === 0 && j > 0, (bPrev + b) * sqh)
            .otherwise(b)
        // bit magnitude 0.3 (±0.15): clusters close enough that residual
        // quantization error competes with cluster separation — at ±0.5
        // every arm recalls 1.0 and the comparison measures nothing
        (mixedBit * 0.3f + lit(0.5f)
          + (pmod(hash(col("id"), j, lit(19)), lit(1000)).cast("float")
            / 50000f)).cast("float")
      }).as("embedding"))
    val qm = mixed.filter(col("vec_id") % 11 === 0)
      .limit(200).localCheckpoint(true)
    Similarity.saveIvfIndex(mixed, "vec_id", "embedding", s"$root/f3",
      nlist, sampleFraction = math.min(1.0, 100000.0 / n))
    val cents3 = Similarity.ivfCentroids(spark, s"$root/f3")
      .localCheckpoint(true)
    // the rotation must train in the space the codes quantize — the
    // RESIDUAL sample, not the raw vectors (a raw-trained rotation
    // applied to residuals was measured WORSE than identity)
    val rotSample = mixed.sample(withReplacement = false,
      math.min(1.0, 50000.0 / n), 42L).localCheckpoint(true)
    val resSample = rotSample
      .select(col("vec_id"), col("embedding").as("_ov"))
      .join(Similarity.assignCells(rotSample, cents3, "vec_id",
        "embedding", 1), "vec_id")
      .join(broadcast(cents3.select(col("cell"), col("_cv").as("_ccv"))),
        "cell")
      .select(col("vec_id"),
        zip_with(col("_ov"), col("_ccv"), (a, b) => a - b).as("_rv"))
    val rot = Similarity.trainOpqRotation(resSample, "vec_id", "_rv",
      m = 8, k = 256, iters = 6, maxTrainRows = 50000).localCheckpoint(true)
    Similarity.saveIvfIndexPQ(mixed, "vec_id", "embedding", s"$root/pqm",
      nlist, pqM = 8, pqK = 256,
      sampleFraction = math.min(1.0, 20000.0 / n), maxIter = 10,
      centroids = Some(cents3), residual = true)
    Similarity.saveIvfIndexPQ(mixed, "vec_id", "embedding", s"$root/pqo",
      nlist, pqM = 8, pqK = 256,
      sampleFraction = math.min(1.0, 20000.0 / n), maxIter = 10,
      centroids = Some(cents3), residual = true, rotation = Some(rot))
    val (f3Res, _) = timed(Similarity.ivfTopKIndexed(qm, s"$root/f3",
      "vec_id", "embedding", k = 10, nprobe = 3)
      .select("query_id", "neighbor_id").localCheckpoint(true))
    val (pmRes, pmS) = timed(Similarity.ivfTopKPQ(qm, s"$root/pqm",
      "vec_id", "embedding", k = 10, nprobe = 3)
      .select("query_id", "neighbor_id").localCheckpoint(true))
    val (poRes, poS) = timed(Similarity.ivfTopKPQ(qm, s"$root/pqo",
      "vec_id", "embedding", k = 10, nprobe = 3)
      .select("query_id", "neighbor_id").localCheckpoint(true))
    val recallPqm = Similarity.recallAgainst(f3Res, pmRes, 10).head.getDouble(1)
    val recallPqo = Similarity.recallAgainst(f3Res, poRes, 10).head.getDouble(1)
    // the newer tiers gate too: per-cell codebooks must at least match
    // the shared-residual recall they refine (the measured win is
    // 0.822 vs 0.750 — the floor just below catches regressions), and
    // OPQ must never score BELOW the unrotated form it wraps (the
    // single-init 0.16 regression class)
    val ok = recallR >= 0.95 && ratioPq < ratio && recallPq >= 0.55 &&
      recallPr >= 0.9 && recallPql >= recallPqr - 0.02 &&
      recallPqo >= recallPqm - 0.02
    println(s"IVF_QUANT n=$n bytesF=${bytes(s"$root/f")} " +
      s"bytesQ=${bytes(s"$root/q")} bytesPQ=${bytes(s"$root/pq")} " +
      s"bytesPQR=${bytes(s"$root/pqr")} bytesPQL=${bytes(s"$root/pql")} " +
      f"ratio=$ratio%.2f ratioPQ=$ratioPq%.2f " +
      f"serveF=$fS%.1fs serveQ=$qS%.1fs serveRefined=$rS%.1fs " +
      f"serveF2=$f2S%.1fs servePQ=$pqS%.1fs servePQRefined=$prS%.1fs " +
      f"servePQR=$qrS%.1fs servePQL=$qlS%.1fs " +
      f"recallRawQvsF=$recall%.4f recallRefinedVsF=$recallR%.4f " +
      f"recallRawPQvsF2=$recallPq%.4f recallRefinedPQvsF2=$recallPr%.4f " +
      f"recallRawPQRvsF2=$recallPqr%.4f recallRawPQLvsF2=$recallPql%.4f " +
      f"qerrPQ=${qerr(s"$root/pq")}%.4f qerrPQR=${qerr(s"$root/pqr")}%.4f " +
      f"qerrPQL=${qerr(s"$root/pql")}%.4f " +
      f"servePQM=$pmS%.1fs servePQO=$poS%.1fs " +
      f"recallRawMixedPQRvsF3=$recallPqm%.4f " +
      f"recallRawMixedOPQvsF3=$recallPqo%.4f " +
      f"qerrMixedPQR=${qerr(s"$root/pqm")}%.4f " +
      f"qerrMixedOPQ=${qerr(s"$root/pqo")}%.4f " +
      s"nClusters=$nClusters ${if (ok) "OK" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
