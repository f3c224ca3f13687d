package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * processed in partition-local batches.
  *
  * The decode step itself is a STUB — image/audio codecs are not available
  * in this environment — replaced by a deterministic fake feature extractor
  * over raw bytes. What is real (and what matters at scale) is the Spark
  * plumbing: binary columns travel as `BinaryType` with a metadata struct,
  * feature extraction runs batched per partition via `mapPartitions` (the
  * Scala analogue of `mapInPandas`: one iterator per partition, vectorized
  * libraries amortize per-batch setup), and the output schema is fixed and
  * columnar.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], format: String)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, first_byte: Long,
      features: Array[Float])

  /** Attach a binary payload + metadata struct to a text table (stand-in
    * for real image/audio bytes; schema shape is what production uses). */
  def withBinaryPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        length(col(textCol).cast("binary")).cast("long").as("n_bytes"),
        lit("text/plain").as("format")).as("meta"))

  /** STUB decoder: deterministic fake features from raw bytes (8 stripe
    * sums). A real deployment swaps `extract` for the codec call; the
    * batching, schema, and partitioning stay identical.
    */
  def extract(payload: Array[Byte], nFeatures: Int = 8): Array[Float] = {
    val acc = new Array[Float](nFeatures)
    var i = 0
    while (i < payload.length) {
      acc(i % nFeatures) += (payload(i) & 0xff).toFloat / 255f
      i += 1
    }
    acc
  }

  /** Shared typed projection of a payload table. Null payloads (failed
    * fetches) are dropped rather than NPE-ing the extraction kernels. */
  private def asMediaRows(media: DataFrame): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"), col("meta.format").as("format"))
      .filter(col("doc_id").isNotNull && col("payload").isNotNull)
      .as[MediaRow]
  }

  /** Batched per-partition feature extraction over the payload table. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    asMediaRows(media)
      .mapPartitions { rows =>
        // per-partition setup would init the codec once here
        rows.map { r =>
          val feats = extract(r.payload)
          MediaFeatures(r.doc_id, r.payload.length.toLong,
            if (r.payload.nonEmpty) (r.payload(0) & 0xff).toLong else -1L, feats)
        }
      }
  }

  /** 64-bit perceptual difference hash (dHash) over the payload byte
    * stream — the public-recipe image near-dup signature (Krawetz-style
    * dHash: sample a fixed grid, set bit i when sample i outshines its
    * neighbor), applied to the OPAQUE binary column: 65 evenly-spaced
    * byte samples s₀…s₆₄ at offsets ⌊i·len/65⌋, bit i = (sᵢ > sᵢ₊₁).
    * On decoded grayscale thumbnails this is the textbook dHash; on raw
    * bytes it is the same locality property (near-identical payloads →
    * near-identical signatures) the banding tier needs — and unlike the
    * decode step it needs NO codec, so it is fully real here: pure
    * column math (substr + hex + conv + a bitwise fold), whole-stage
    * codegen, zero UDFs, and bit-replayable by a SQL oracle.
    *
    * Output (_id, simhash) plugs STRAIGHT into
    * [[Dedup.simhashPairs]] (Hamming band blocking, pigeonhole-exact
    * for maxDist < bands, hot-bucket collapse) and from there into the
    * connected-components clustering — byte-identical payloads collapse
    * before banding exactly like identical documents. Empty payloads
    * are dropped; payloads shorter than 65 bytes sample with repeats
    * (still deterministic). Sample offsets use long arithmetic — a
    * 2 GiB payload times 64 overflows int. */
  def dHash(media: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    val len = length(col(payloadCol)).cast("long")
    val samples = transform(sequence(lit(0L), lit(64L)),
      i => conv(hex(col(payloadCol)
          .substr((i * len / 65L + 1L).cast("int"), lit(1))), 16, 10)
        .cast("long"))
    media
      .filter(col(idCol).isNotNull && col(payloadCol).isNotNull &&
        length(col(payloadCol)) >= 1)
      .select(col(idCol).cast("long").as("_id"), samples.as("_s"))
      .select(col("_id"),
        aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, i) =>
          when(element_at(col("_s"), i + 1) > element_at(col("_s"), i + 2),
            acc.bitwiseOR(shiftLeftCol(lit(1L), i))).otherwise(acc))
          .as("simhash"))
  }

  /** Catalyst ShiftLeft with a COLUMN shift amount — the functions API
    * only takes a literal Int, and the dHash fold's bit index is the
    * lambda variable. */
  private def shiftLeftCol(v: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        org.apache.spark.sql.graft.ColumnBridge.expression(v),
        org.apache.spark.sql.graft.ColumnBridge.expression(n)))

  /** Perceptual near-dup payload pairs: [[dHash]] signatures through
    * [[Dedup.simhashPairs]]' banding — (i, j, hamming) with Hamming
    * distance ≤ maxDist, exact-complete for maxDist < bands.
    *
    * The signature table is MATERIALIZED first (16 bytes a row —
    * nothing at any scale): the banding consumes its input in several
    * subtrees (group, member map, band explode, both join sides), and
    * the 65-sample higher-order expression is interpreted per
    * evaluation — inlining it re-runs the sampling once per subtree
    * (measured ~17× slower at sf0.1). */
  def dHashPairs(media: DataFrame, maxDist: Int, bands: Int = 4,
      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame =
    Dedup.simhashPairs(dHash(media, idCol, payloadCol).localCheckpoint(),
      maxDist, bands)

  /** Perceptual near-dup CLUSTERS: the pair set through the shared
    * connected-components machinery ([[Dedup.componentsTiered]]) — one
    * (rep_id, n_members) row per multi-member cluster, rep = min id;
    * the action that actually drops near-identical media payloads. */
  def dHashClusters(media: DataFrame, maxDist: Int, bands: Int = 4,
      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    val pairs = dHashPairs(media, maxDist, bands, idCol, payloadCol)
      .select(col("i"), col("j"))
    val ids = media.filter(col(idCol).isNotNull && col(payloadCol).isNotNull &&
        length(col(payloadCol)) >= 1)
      .select(col(idCol).cast("long").as("id"))
    ids.join(Dedup.componentsTiered(pairs), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("rep_id"))
      .groupBy("rep_id").agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") > 1)
  }

  case class ResizedRow(doc_id: Long, width: Int, height: Int,
      payload: Array[Byte])
  case class FrameRow(doc_id: Long, frame_idx: Long, offset: Long,
      frame: Array[Byte])

  /** STUB image resize: emits a deterministic `width × height`-byte payload
    * derived from the source bytes (a real deployment swaps `resizeKernel`
    * for the codec's decode→scale→encode). The plumbing — binary in/out,
    * per-partition batching, fixed output schema — is the production shape.
    */
  def resize(media: DataFrame, width: Int, height: Int): Dataset[ResizedRow] = {
    require(width > 0 && height > 0, s"dimensions must be positive: $width×$height")
    require(width.toLong * height <= Int.MaxValue,
      s"payload $width×$height overflows an array size")
    val spark = media.sparkSession
    import spark.implicits._
    def resizeKernel(src: Array[Byte], n: Int): Array[Byte] = {
      // deterministic down/up-sample over the byte stream
      val out = new Array[Byte](n)
      if (src.nonEmpty) {
        var i = 0
        while (i < n) { out(i) = src((i.toLong * src.length / n).toInt); i += 1 }
      }
      out
    }
    asMediaRows(media)
      .mapPartitions { rows =>
        rows.map(r => ResizedRow(r.doc_id, width, height,
          resizeKernel(r.payload, width * height)))
      }
  }

  /** Near-duplicate VIDEO pairs by shared frames — the frame tier of the
    * perceptual dedup family, a pure composition of shipped pieces:
    * [[frameSample]] splits payloads into fixed-size frames, each frame
    * gets the 64-bit [[dHash]] signature (column math, no codec), frame
    * signatures flow through [[Dedup.simhashPairs]]' Hamming band
    * blocking (exact-complete for maxDist < bands, hot-bucket capped),
    * and frame-level matches lift to (i, j, n_matches) video pairs —
    * `n_matches` = the number of cross-video frame pairs within
    * `maxDist`, i.e. the shared-segment mass. `minFrames` floors it (one
    * perturbed-copy frame is enough at 1; raise it to demand a longer
    * shared segment).
    *
    * Frame identity is the composite long `doc_id << 24 | frame_idx` —
    * reversible by shift, so the video lift is pure arithmetic, no join
    * back through a frame table. Contract (asserted per row, codegen'd):
    * `0 ≤ doc_id < 2³⁹` and sampled `frame_idx < 2²⁴` (16M sampled
    * frames per video). Nothing wider than (fid, band, digest) or a
    * 16-byte signature row shuffles; the only corpus-wide exchanges are
    * the band equi-join and one (va, vb) count — both uniform unless the
    * data plants a viral identical frame, which the banding's hot-bucket
    * cap already bounds. */
  def frameDupPairs(media: DataFrame, frameBytes: Int, everyN: Int,
      maxDist: Int, minFrames: Long = 1L, bands: Int = 4): DataFrame = {
    val frames = frameSample(media, frameBytes, everyN).toDF()
    val ok = col("doc_id").between(0L, (1L << 39) - 1) &&
      col("frame_idx") < (1L << 24)
    val fid = coalesce(assert_true(ok,
        lit("frameDupPairs: doc_id must be in [0, 2^39) and sampled " +
          "frame_idx < 2^24 for the composite frame id")).cast("long"),
      shiftleft(col("doc_id"), 24) + col("frame_idx"))
    val sigs = dHash(frames.select(fid.as("_fid"), col("frame")),
      "_fid", "frame").localCheckpoint()
    Dedup.simhashPairs(sigs, maxDist, bands)
      .select(shiftright(col("i"), 24).as("va"),
        shiftright(col("j"), 24).as("vb"))
      .filter(col("va") =!= col("vb"))
      .select(least(col("va"), col("vb")).as("i"),
        greatest(col("va"), col("vb")).as("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("n_matches"))
      .filter(col("n_matches") >= minFrames)
  }

  /** Near-duplicate video CLUSTERS: [[frameDupPairs]] edges through the
    * shared connected-components machinery — one (rep_id, n_members) row
    * per multi-member cluster, rep = min id; the segment-level analogue
    * of [[dHashClusters]]. */
  def frameDupClusters(media: DataFrame, frameBytes: Int, everyN: Int,
      maxDist: Int, minFrames: Long = 1L, bands: Int = 4): DataFrame = {
    val pairs = frameDupPairs(media, frameBytes, everyN, maxDist,
      minFrames, bands).select(col("i"), col("j"))
    val ids = media.filter(col("doc_id").isNotNull && col("payload").isNotNull)
      .select(col("doc_id").cast("long").as("id"))
    ids.join(Dedup.componentsTiered(pairs), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("rep_id"))
      .groupBy("rep_id").agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") > 1)
  }

  /** STUB video frame sampling: every `everyN`-th fixed-size frame of the
    * payload (a real deployment swaps the splitter for the demuxer; offsets
    * and batch shape are real). One output row per sampled frame — the
    * explode happens inside the partition iterator, so a long video never
    * materializes all frames at once.
    */
  def frameSample(media: DataFrame, frameBytes: Int,
      everyN: Int): Dataset[FrameRow] = {
    require(frameBytes > 0 && everyN > 0)
    val spark = media.sparkSession
    import spark.implicits._
    asMediaRows(media)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val nFrames = r.payload.length / frameBytes
          (0L until nFrames.toLong by everyN.toLong).iterator.map { f =>
            val off = f * frameBytes
            FrameRow(r.doc_id, f, off,
              java.util.Arrays.copyOfRange(r.payload, off.toInt,
                off.toInt + frameBytes))
          }
        }
      }
  }
}
