package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Quality

/** Quality-classifier scale probe (SURVEY §8): the driver-kernel trainer
  * on a curation-scale labeled sample, then corpus-scale scoring — the
  * split the tier is built around. Synthetic corpus: class-marker tokens
  * (three quality vs three spam markers per doc, drawn by label) mixed
  * with a large hashed noise vocabulary, so the trainer must spread
  * weight over marker features against ~1 M noise features instead of
  * memorizing one token.
  *
  * Reports: training wall (features + collect + GD), scoring wall over
  * `SPARK_GRAFT_CLF_BASE` docs (default 1 M), and sign accuracy of the
  * scored corpus against its generating labels. */
object ClassifierProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("SPARK_GRAFT_CLF_BASE", "1000000").toLong
    val nTrain = 50000L
    val dim = 1 << 18

    // 24 tokens/doc: 3 class markers + 21 noise tokens from a ~1M-word
    // vocabulary (hash-derived, shared across classes)
    def docs(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).select(col("id").as("doc_id"),
        (col("id") % 2).cast("int").as("label"),
        concat_ws(" ",
          (Seq(
            when(col("id") % 2 === 1, lit("insight analysis evidence"))
              .otherwise(lit("click offer winner"))) ++
            (0 until 21).map(j =>
              concat(lit("w"), pmod(hash(col("id"), lit(j)), lit(1000000))
                .cast("string")))): _*).as("text"))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val labeled = docs(n, n + nTrain).localCheckpoint()
    val (weights, trainS) = timed(
      Quality.trainTextClassifier(labeled, "doc_id", "text", "label",
        dim, iters = 60, maxTrainDocs = nTrain.toInt).localCheckpoint())
    val nWeights = weights.count()

    val corpus = docs(0, n)
    val (scored, scoreS) = timed(
      Quality.scoreTextClassifier(corpus, "doc_id", "text", weights, dim)
        .localCheckpoint())
    // sign accuracy vs the generating label
    val acc = scored
      .join(corpus.select(col("doc_id"), col("label")), "doc_id")
      .select(avg(((col("logit_micro") > 0).cast("int") === col("label"))
        .cast("int")).as("acc"))
      .head.getDouble(0)
    val ok = acc > 0.99
    println(f"CLASSIFIER n=$n nTrain=$nTrain dim=$dim " +
      f"nWeights=$nWeights trainSec=$trainS%.1f scoreSec=$scoreS%.1f " +
      f"signAcc=$acc%.4f ${if (ok) "OK" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
