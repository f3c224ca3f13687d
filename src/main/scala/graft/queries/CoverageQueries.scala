package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Cols
import graft.operators.{BandJoin, Fill, Sessionize}
import Q._

/** Coverage pack: the remaining SURVEY §2 rows that are individually small —
  * filters/casts (P2/P6/P8/P10), source/sink round trips (S3/S4/S7), simple
  * aggregations (A4/A5/A8/A9), window search (W7), event-window expansion
  * (G4), merge-on-index (J10), and the §2.8 scalar surface (map / array /
  * JSON / geometry). Every entry is DuckDB-differential-checked.
  */
object CoverageQueries {
  private val GAP_US = 86400L * 1000000L

  /** y coordinate derived from user_id — shared by the geometry queries. */
  private def yCoord = (col("user_id") % 100).cast("double") / 10.0

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P2: substring-contains filter (reference anchor-part filter,
    // combine_pose_id_chunk.py:274)
    "p2_contains_filter" -> ((s, dir) => {
      val p = t(s, dir, "part")
      sortAll(p.filter(col("p_type").contains("DAR"))
        .groupBy("p_brand").agg(count(lit(1)).as("n"),
          sum(col("p_size").cast("long")).as("sum_size")))
    }),

    // P6: NaN/null-row drop (reference dropna,
    // social_behaviour_detection.py:558)
    "p6_null_drop" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("v", when(col("event_type") =!= "error", cents(col("value"))))
      sortAll(e.na.drop(Seq("v"))
        .groupBy("event_type").agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v")))
    }),

    // P8: drop-unmatched filter after an update join (reference
    // combine_pose_id_chunk.py:319 removes never-overwritten identities)
    "p8_drop_unmatched" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val matched = e.filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct().withColumn("matched", lit(1))
      sortAll(e.join(broadcast(matched), Seq("user_id"), "left")
        .filter(col("matched").isNotNull)
        .groupBy("event_type").agg(count(lit(1)).as("n")))
    }),

    // P10: coordinate int cast (reference pixel indexing,
    // generate_composite_quadrant_videos.py:61)
    "p10_int_cast" -> ((s, dir) => {
      val e = t(s, dir, "events")
      sortAll(e.select(
          col("value").cast("int").cast("long").as("xi"),
          yCoord.cast("int").cast("long").as("yi"))
        .groupBy("xi", "yi").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 3))
    }),

    // S3: epoch true-end probing = max(time) per epoch partition
    // (reference detect_fights_all_epochs.py:45-82 probes the last video)
    "s3_epoch_end" -> ((s, dir) => {
      val e = t(s, dir, "events")
      sortAll(e.groupBy(date_trunc("day", col("ts")).as("epoch"))
        .agg(max("ts").as("epoch_end"), count(lit(1)).as("n_rows")))
    }),

    // S4+S7: CSV sink then CSV source round trip (reference event-table CSVs,
    // detect_fights.py:132) — write a projection with an explicit schema,
    // read it back, aggregate. Oracle runs the same aggregate on parquet.
    "s4_csv_roundtrip" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val path = s"/tmp/graft_csv_roundtrip_${dir.replaceAll("[^0-9a-zA-Z]", "_")}"
      e.filter(col("event_type").isin("purchase", "signup"))
        .select(col("event_id"), col("event_type"), cents(col("value")).as("v_cents"))
        .coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(path)
      val back = s.read.option("header", "true")
        .schema(StructType(Seq(
          StructField("event_id", LongType), StructField("event_type", StringType),
          StructField("v_cents", LongType))))
        .csv(path)
      sortAll(back.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("v_cents").as("sum_cents"),
          min("event_id").as("min_id"), max("event_id").as("max_id")))
    }),

    // S4+S7 at the LLM-corpus interchange format: JSONL sink then source
    // round trip — write the documents table as line-delimited JSON, read
    // it back with an explicit schema, and aggregate with a per-text md5
    // fingerprint SUM so JSON string escaping must round-trip every byte
    // of every document for the hash gate to pass. Oracle runs the same
    // aggregate on the parquet directly.
    "s12_jsonl_roundtrip" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      // per-invocation temp dir (the ANN-query convention): a fixed
      // dir-derived path raced when two harness runs shared an sf dir —
      // one overwrote while the other read back
      val path = java.nio.file.Files
        .createTempDirectory("graft_jsonl_roundtrip").toString
      d.select(col("doc_id"), col("lang"), col("source"), col("text"))
        .coalesce(1).write.mode("overwrite").json(path)
      val back = s.read.schema(StructType(Seq(
          StructField("doc_id", LongType), StructField("lang", StringType),
          StructField("source", StringType), StructField("text", StringType))))
        .json(path)
      sortAll(back.groupBy("lang", "source")
        .agg(count(lit(1)).as("n"),
          sum(length(col("text"))).as("sum_chars"),
          sum(conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
            .cast("long")).as("sum_fp"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id")))
    }),

    // A4: mean over event group (reference nanmean per event slice,
    // social_behaviour_detection.py:354-356)
    "a4_mean_event" -> ((s, dir) => {
      val e = t(s, dir, "events")
      sortAll(e.groupBy("event_type")
        .agg(round(avg(cents(col("value"))).cast("double") / 100.0, 6).as("mean_value"),
          count(lit(1)).as("n")))
    }),

    // A5: count-nonzero of a condition per group (reference
    // count_nonzero(orientation_condition), social_behaviour_detection.py:283-287)
    "a5_count_nonzero" -> ((s, dir) => {
      val e = t(s, dir, "events")
      sortAll(e.groupBy("user_id")
        .agg(sum(when(col("value") > 100.0, 1L).otherwise(0L)).as("n_big"),
          count(lit(1)).as("n")))
    }),

    // A6: group-count matrix over two keys (reference notebook cells 3/5:
    // groupby(["id","identity_name"]).count() — the per-(track, identity)
    // vote matrix consumed by the identity argmax)
    "a6_group_count" -> ((s, dir) => {
      val e = t(s, dir, "events")
      sortAll(e.groupBy("user_id", "event_type").agg(count(lit(1)).as("n")))
    }),

    // A8: 2-D histogram stratified sampling (reference sample_n_from_bins,
    // notebook cell 1) — bin (x, y) into a 10×10 grid, keep ≤2 rows per bin
    // by a deterministic order (row_number over the bin partition).
    "a8_binned_sample" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val binned = e.select(col("event_id"),
        floor(col("value") / 20.0).as("binx"),
        floor(yCoord).as("biny"))
      val w = Window.partitionBy("binx", "biny").orderBy("event_id")
      sortAll(binned.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).select("binx", "biny", "event_id"))
    }),

    // A9: confusion-matrix metrics in one aggregation pass (reference
    // sleap_optuna_train.py:89-175)
    "a9_confusion_metrics" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val pred = col("value") > 100.0
      val actual = col("event_type").isin("purchase", "signup")
      val agged = e.agg(
        sum(when(pred && actual, 1L).otherwise(0L)).as("tp"),
        sum(when(pred && !actual, 1L).otherwise(0L)).as("fp"),
        sum(when(!pred && actual, 1L).otherwise(0L)).as("fn"),
        sum(when(!pred && !actual, 1L).otherwise(0L)).as("tn"))
      sortAll(agged.select(col("tp"), col("fp"), col("fn"), col("tn"),
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6).as("precision"),
        round(col("tp").cast("double") / (col("tp") + col("fn")), 6).as("recall"),
        round(lit(2.0) * col("tp") / (lit(2.0) * col("tp") + col("fp") + col("fn")), 6)
          .as("f1")))
    }),

    // W7: search backward for the last valid row per group (reference walks
    // back from event end to the last frame with non-NaN centroids,
    // social_behaviour_detection.py:704-719)
    "w7_search_backward" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("v", when(col("event_type") =!= "error", cents(col("value"))))
      val filled = Fill.ffill(e, Seq("v"), "ts", Seq("user_id"), tieBreak = Seq("event_id"))
      val wDesc = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      sortAll(filled.withColumn("rn", row_number().over(wDesc)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event"), col("v").as("last_valid")))
    }),

    // G4: event search-window expansion — for each session end, count the
    // events in the following hour (reference examines [last_start, +1 s),
    // social_behaviour_detection.py:289-301); band join keeps it equi-shaped.
    "g4_window_expansion" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val sessed = Sessionize.sessionize(e, "ts", Seq("user_id"), GAP_US,
        tieBreak = Seq("event_id"))
      val ends = sessed.groupBy("user_id", "session_id").agg(max("ts").as("end_ts"))
      val after = BandJoin.bandJoin(ends, e.select("ts"), "end_ts", "ts", Nil,
        1L, 3600L * 1000000L)
      sortAll(after.groupBy("user_id", "session_id").agg(count(lit(1)).as("n_after")))
    }),

    // J10: merge-on-index (equi-join on the time index; reference
    // generate_composite_quadrant_videos.py:78)
    "j10_merge_on_index" -> ((s, dir) => {
      val e = t(s, dir, "events")
      def firstPerSec(typ: String, out: String) = {
        val w = Window.partitionBy("sec").orderBy("event_id")
        e.filter(col("event_type") === typ)
          .withColumn("sec", date_trunc("minute", col("ts")))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("sec"), col("event_id").as(out))
      }
      sortAll(firstPerSec("purchase", "p_event")
        .join(firstPerSec("view", "v_event"), "sec"))
    }),

    // §2.8 map: identity_likelihood-style map build + key lookup
    // (reference combine_pose_id_chunk.py:95,141)
    "m1_map_lookup" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val counts = e.groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      val maps = counts.groupBy("user_id")
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt")))).as("m"))
      sortAll(maps.select(col("user_id"),
        element_at(col("m"), "purchase").as("n_purchase"),
        size(col("m")).cast("long").as("n_keys")))
    }),

    // §2.8 array: sorted distinct set + slice + contains + join
    // (reference list intersections, generate_composite_quadrant_videos.py:295)
    "arr1_array_fns" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val arrs = e.groupBy("user_id")
        .agg(array_sort(collect_set(col("event_type"))).as("types"))
      sortAll(arrs.select(col("user_id"),
        size(col("types")).cast("long").as("n_types"),
        array_join(slice(col("types"), 1, 2), ",").as("first_two"),
        array_contains(col("types"), "purchase").as("has_purchase")))
    }),

    // §2.8 JSON: from_json over the props payload (reference json.loads
    // config params, detect_fights.py:11-15)
    "json1_props_extract" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val k = from_json(col("props"), StructType(Seq(StructField("k", LongType))))("k")
      sortAll(e.select((k % 10).as("k_bucket"))
        .groupBy("k_bucket").agg(count(lit(1)).as("n")))
    }),

    // §2.8 geometry: annulus ROI + convex point-in-polygon as pure column
    // math (reference social_behaviour_detection.py:241-257 and
    // generate_composite_quadrant_videos.py:246-255)
    "geo1_roi" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val x = col("value"); val y = yCoord
      val ann = Cols.inAnnulus(x, y, lit(100.0), lit(5.0), lit(20.0), lit(80.0))
      val pip = Cols.inConvexPolygon(x, y,
        Seq((50.0, 0.0), (150.0, 0.0), (150.0, 10.0), (50.0, 10.0)))
      sortAll(e.groupBy("event_type").agg(
        sum(when(ann, 1L).otherwise(0L)).as("n_annulus"),
        sum(when(pip, 1L).otherwise(0L)).as("n_quad"),
        count(lit(1)).as("n")))
    }),

    // Quadrant membership + most-central selection over a 2×2 FOV tiling
    // (reference generate_composite_quadrant_videos.py:224-283); the
    // nearest-FOV fallback fires for positions outside every FOV
    "geo3_quadrant_select" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val pos = e.select(col("event_id"), (col("value") * 2).as("x"),
        ((col("user_id") % 100).cast("double") * 2).as("y"))
      val homos = Seq(
        Seq(1.0, 0, 0, 0, 1, 0, 0, 0, 1), Seq(1.0, 0, 100, 0, 1, 0, 0, 0, 1),
        Seq(1.0, 0, 0, 0, 1, 100, 0, 0, 1), Seq(1.0, 0, 100, 0, 1, 100, 0, 0, 1))
      val fovs = homos.map(h => graft.operators.Quadrants.fovCorners(h, 100, 100))
      val q = graft.operators.Quadrants.withQuadrants(pos, "x", "y", fovs)
      // n_possible_quadrants, not size(array): keeps this plan free of
      // higher-order array expressions → full whole-stage codegen
      sortAll(q.select(col("event_id"),
        col("n_possible_quadrants").as("n_possible"),
        col("most_central_quadrant").as("most_central")))
    }),

    // S2: epoch/chunk catalog discovery — file-name metadata surfaced as a
    // column and regex-parsed (reference find_epochs directory scans,
    // detect_fights_all_epochs.py:12-94)
    "s2_catalog_discovery" -> ((s, dir) => {
      val e = t(s, dir, "events")
      sortAll(e
        .withColumn("chunk",
          regexp_extract(input_file_name(), "(sf[0-9.]+)/events\\.parquet", 1))
        .groupBy("chunk").agg(count(lit(1)).as("n_rows"),
          min("ts").as("chunk_start"), max("ts").as("chunk_end")))
    }),

    // S5+S6: JSON config / metadata struct source — write a nested config,
    // read it back via spark.read.json, project nested fields (reference
    // confmap_config.json patch, combine_pose_id_chunk.py:291-305, and the
    // experiment metadata struct, social_behaviour_detection.py:89-98)
    "s5_json_config" -> ((s, dir) => {
      val path = "/tmp/graft_json_cfg"
      val cfg = """{"experiment":"social-02",
        |"ActiveRegion":{"ArenaInnerRadius":20.5,"ArenaOuterRadius":80.25,
        |"ArenaCenter":{"X":100.0,"Y":5.0}},
        |"Devices":{"VideoController":{"TriggerFrequency":50}}}""".stripMargin
          .replaceAll("\n", "")
      import java.nio.file.{Files, Paths}
      Files.createDirectories(Paths.get(path))
      Files.writeString(Paths.get(s"$path/metadata.json"), cfg + "\n")
      val meta = s.read.json(path)
      sortAll(meta.select(
        col("experiment"),
        col("ActiveRegion.ArenaInnerRadius").as("r_inner"),
        col("ActiveRegion.ArenaOuterRadius").as("r_outer"),
        col("ActiveRegion.ArenaCenter.X").as("cx"),
        col("Devices.VideoController.TriggerFrequency").cast("long").as("fps")))
    }),

    // S11: native HARP .bin round-trip under the oracle gate — events →
    // distributed chunk sink → DataSource V2 reader → aggregate; the oracle
    // computes the same float32-quantized sum directly on the parquet
    "s11_harp_roundtrip" -> ((s, dir) => {
      val out = s"/tmp/graft_harp_rt_${math.abs(dir.hashCode)}"
      val e = t(s, dir, "events").filter(col("event_id") < 1000)
        .select(col("ts").as("time"), array(col("value").cast("float")).as("payload"))
      graft.sources.HarpBin.writeChunkFiles(e, out, "CameraTop", 222)
      val back = s.read.format("graft.sources.HarpBinSource").load(s"$out/*.bin")
      sortAll(back.agg(count(lit(1)).as("n"),
        sum(round(element_at(col("payload"), 1).cast("double") * 100).cast("long"))
          .as("sum_cents")))
    }),

    // S10: video clip manifest — padded (start, end) windows + formatted
    // clip names projected from the session/event table (reference
    // generate_videos padding, social_behaviour_detection.py:880-919)
    "s10_clip_manifest" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val sessed = Sessionize.sessionize(e, "ts", Seq("user_id"),
        86400L * 1000000L, tieBreak = Seq("event_id"))
      val sessions = sessed.groupBy("user_id", "session_id")
        .agg(min("ts").as("start_ts"), max("ts").as("end_ts"), count(lit(1)).as("n"))
        .filter(col("n") >= 20)
      sortAll(sessions.select(
        col("user_id"),
        (col("start_ts") - expr("INTERVAL 5 SECONDS")).as("clip_start"),
        (col("end_ts") + expr("INTERVAL 5 SECONDS")).as("clip_end"),
        format_string("clip_u%d_%s.avi", col("user_id"),
          date_format(col("start_ts"), "yyyy-MM-dd'T'HH-mm-ss")).as("clip_name")))
    }),

    // J2 forward flavor: first event at-or-after each probe time
    "j2_asof_forward" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val p = e.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts"))
      val j = graft.operators.AsOfJoin.asofJoin(p, v, "ts", Seq("user_id"),
        graft.operators.AsOfJoin.Forward, Some(172800000000L),
        tieBreak = Seq("view_id"))
      sortAll(j.filter(col("view_id").isNotNull).select(
        col("event_id"), col("user_id"), col("view_id"),
        round((unix_micros(col("_asof_time")) - unix_micros(col("ts"))).cast("double")
          / 1000000.0, 6).as("delta_sec")))
    }),

    // §2.8 math: per-step kinematics — euclidean distance, orientation
    // degrees mod 360, speed (reference social_behaviour_detection.py:571-601)
    "geo2_kinematics" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val x = col("value"); val y = yCoord
      val stepped = e
        .withColumn("px", lag(x, 1).over(w)).withColumn("py", lag(y, 1).over(w))
        .withColumn("pts", lag(col("ts"), 1).over(w))
        .filter(col("px").isNotNull)
      val dx = x - col("px"); val dy = y - col("py")
      val dt = (unix_micros(col("ts")) - unix_micros(col("pts"))).cast("double") / 1e6
      sortAll(stepped.select(col("event_id"), col("user_id"),
        round(sqrt(dx * dx + dy * dy), 6).as("dist"),
        round(pmod(degrees(atan2(dy, dx)), lit(360.0)), 6).as("orient_deg"),
        round(sqrt(dx * dx + dy * dy) / dt, 9).as("speed")))
    })
  )

  private val sessSql =
    """sess AS (
      |  SELECT *, CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 86400000000 THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
      |  FROM (
      |    SELECT *, epoch_us(ts) AS us,
      |      lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |    FROM events))""".stripMargin

  val oracle: Map[String, String] = Map(
    "geo3_quadrant_select" ->
      s"""WITH pos AS (
         |  SELECT event_id, value * 2 AS x, CAST(user_id % 100 AS DOUBLE) * 2 AS y
         |  FROM events),
         |f AS (SELECT event_id, x, y,
         |  CASE WHEN x >= 0 AND x <= 99 AND y >= 0 AND y <= 99 THEN 1 ELSE 0 END AS m0,
         |  CASE WHEN x >= 100 AND x <= 199 AND y >= 0 AND y <= 99 THEN 1 ELSE 0 END AS m1,
         |  CASE WHEN x >= 0 AND x <= 99 AND y >= 100 AND y <= 199 THEN 1 ELSE 0 END AS m2,
         |  CASE WHEN x >= 100 AND x <= 199 AND y >= 100 AND y <= 199 THEN 1 ELSE 0 END AS m3,
         |  (x-49.5)*(x-49.5) + (y-49.5)*(y-49.5) AS d0,
         |  (x-149.5)*(x-149.5) + (y-49.5)*(y-49.5) AS d1,
         |  (x-49.5)*(x-49.5) + (y-149.5)*(y-149.5) AS d2,
         |  (x-149.5)*(x-149.5) + (y-149.5)*(y-149.5) AS d3
         |FROM pos),
         |g AS (SELECT event_id, m0 + m1 + m2 + m3 AS n_possible,
         |  CASE WHEN m0 + m1 + m2 + m3 = 0 OR m0 = 1 THEN d0 ELSE 1e308 END AS md0,
         |  CASE WHEN m0 + m1 + m2 + m3 = 0 OR m1 = 1 THEN d1 ELSE 1e308 END AS md1,
         |  CASE WHEN m0 + m1 + m2 + m3 = 0 OR m2 = 1 THEN d2 ELSE 1e308 END AS md2,
         |  CASE WHEN m0 + m1 + m2 + m3 = 0 OR m3 = 1 THEN d3 ELSE 1e308 END AS md3
         |FROM f)
         |SELECT event_id, n_possible,
         |  CASE WHEN md0 <= md1 AND md0 <= md2 AND md0 <= md3 THEN 0
         |       WHEN md1 <= md2 AND md1 <= md3 THEN 1
         |       WHEN md2 <= md3 THEN 2 ELSE 3 END AS most_central
         |FROM g
         |${orderBySql("event_id", "n_possible", "most_central")}""".stripMargin,

    "s11_harp_roundtrip" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(round(CAST(CAST(value AS REAL) AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         |FROM events WHERE event_id < 1000
         |${orderBySql("n", "sum_cents")}""".stripMargin,

    "p2_contains_filter" ->
      s"""SELECT p_brand, count(*) AS n, CAST(sum(p_size) AS BIGINT) AS sum_size
         |FROM part WHERE p_type LIKE '%DAR%'
         |GROUP BY p_brand
         |${orderBySql("p_brand", "n", "sum_size")}""".stripMargin,

    "p6_null_drop" ->
      s"""SELECT event_type, count(*) AS n,
         |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_v
         |FROM events WHERE event_type <> 'error'
         |GROUP BY event_type
         |${orderBySql("event_type", "n", "sum_v")}""".stripMargin,

    "p8_drop_unmatched" ->
      s"""SELECT event_type, count(*) AS n FROM events e
         |WHERE EXISTS (SELECT 1 FROM events x
         |              WHERE x.event_type = 'purchase' AND x.user_id = e.user_id)
         |GROUP BY event_type
         |${orderBySql("event_type", "n")}""".stripMargin,

    "p10_int_cast" ->
      s"""SELECT CAST(trunc(value) AS BIGINT) AS xi,
         |  CAST(trunc(CAST(user_id % 100 AS DOUBLE)/10.0) AS BIGINT) AS yi,
         |  count(*) AS n
         |FROM events GROUP BY 1, 2 HAVING count(*) >= 3
         |${orderBySql("xi", "yi", "n")}""".stripMargin,

    "s3_epoch_end" ->
      s"""SELECT date_trunc('day', ts) AS epoch, max(ts) AS epoch_end, count(*) AS n_rows
         |FROM events GROUP BY 1
         |${orderBySql("epoch", "epoch_end", "n_rows")}""".stripMargin,

    "s4_csv_roundtrip" ->
      s"""SELECT event_type, count(*) AS n,
         |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents,
         |  min(event_id) AS min_id, max(event_id) AS max_id
         |FROM events WHERE event_type IN ('purchase', 'signup')
         |GROUP BY event_type
         |${orderBySql("event_type", "n", "sum_cents", "min_id", "max_id")}""".stripMargin,

    "s12_jsonl_roundtrip" ->
      s"""SELECT lang, source, count(*) AS n,
         |  CAST(sum(length(text)) AS BIGINT) AS sum_chars,
         |  CAST(sum(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT) AS sum_fp,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM documents GROUP BY 1, 2
         |${orderBySql("lang", "source", "n", "sum_chars", "sum_fp",
              "min_id", "max_id")}""".stripMargin,

    "a4_mean_event" ->
      s"""SELECT event_type,
         |  round(CAST(avg(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 100.0, 6) AS mean_value,
         |  count(*) AS n
         |FROM events GROUP BY event_type
         |${orderBySql("event_type", "mean_value", "n")}""".stripMargin,

    "a5_count_nonzero" ->
      s"""SELECT user_id,
         |  CAST(sum(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
         |  count(*) AS n
         |FROM events GROUP BY user_id
         |${orderBySql("user_id", "n_big", "n")}""".stripMargin,

    "a6_group_count" ->
      s"""SELECT user_id, event_type, count(*) AS n
         |FROM events GROUP BY user_id, event_type
         |${orderBySql("user_id", "event_type", "n")}""".stripMargin,

    "a8_binned_sample" ->
      s"""SELECT binx, biny, event_id FROM (
         |  SELECT CAST(floor(value/20.0) AS BIGINT) AS binx,
         |    CAST(floor(CAST(user_id % 100 AS DOUBLE)/10.0) AS BIGINT) AS biny,
         |    event_id,
         |    row_number() OVER (PARTITION BY CAST(floor(value/20.0) AS BIGINT),
         |      CAST(floor(CAST(user_id % 100 AS DOUBLE)/10.0) AS BIGINT)
         |      ORDER BY event_id) AS rn
         |  FROM events) WHERE rn <= 2
         |${orderBySql("binx", "biny", "event_id")}""".stripMargin,

    "a9_confusion_metrics" ->
      s"""WITH c AS (
         |  SELECT
         |    CAST(sum(CASE WHEN value > 100.0 AND event_type IN ('purchase','signup') THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN value > 100.0 AND event_type NOT IN ('purchase','signup') THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN value <= 100.0 AND event_type IN ('purchase','signup') THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |    CAST(sum(CASE WHEN value <= 100.0 AND event_type NOT IN ('purchase','signup') THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM events)
         |SELECT tp, fp, fn, tn,
         |  round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision,
         |  round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall,
         |  round(2.0 * tp / (2.0 * tp + fp + fn), 6) AS f1
         |FROM c
         |${orderBySql("tp", "fp", "fn", "tn", "precision", "recall", "f1")}""".stripMargin,

    "w7_search_backward" ->
      s"""SELECT user_id, event_id AS last_event, v_filled AS last_valid FROM (
         |  SELECT user_id, event_id,
         |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM (SELECT user_id, event_id, ts,
         |          CASE WHEN event_type <> 'error' THEN CAST(round(value*100) AS BIGINT) END AS v
         |        FROM events)) WHERE rn = 1
         |${orderBySql("user_id", "last_event", "last_valid")}""".stripMargin,

    "g4_window_expansion" ->
      s"""WITH $sessSql,
         |ends AS (SELECT user_id, session_id, max(ts) AS end_ts
         |         FROM sess GROUP BY user_id, session_id)
         |SELECT user_id, session_id, n_after FROM (
         |  SELECT en.user_id AS user_id, en.session_id AS session_id, count(*) AS n_after
         |  FROM ends en JOIN events ev
         |    ON epoch_us(ev.ts) - epoch_us(en.end_ts) BETWEEN 1 AND 3600000000
         |  GROUP BY en.user_id, en.session_id)
         |${orderBySql("user_id", "session_id", "n_after")}""".stripMargin,

    "j10_merge_on_index" ->
      s"""WITH p AS (
         |  SELECT sec, event_id AS p_event FROM (
         |    SELECT date_trunc('minute', ts) AS sec, event_id,
         |      row_number() OVER (PARTITION BY date_trunc('minute', ts) ORDER BY event_id) AS rn
         |    FROM events WHERE event_type = 'purchase') WHERE rn = 1),
         |v AS (
         |  SELECT sec, event_id AS v_event FROM (
         |    SELECT date_trunc('minute', ts) AS sec, event_id,
         |      row_number() OVER (PARTITION BY date_trunc('minute', ts) ORDER BY event_id) AS rn
         |    FROM events WHERE event_type = 'view') WHERE rn = 1)
         |SELECT p.sec, p.p_event, v.v_event FROM p JOIN v USING (sec)
         |${orderBySql("sec", "p_event", "v_event")}""".stripMargin,

    "m1_map_lookup" ->
      s"""SELECT user_id,
         |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
         |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_keys
         |FROM events GROUP BY user_id
         |${orderBySql("user_id", "n_purchase", "n_keys")}""".stripMargin,

    "arr1_array_fns" ->
      s"""SELECT user_id,
         |  CAST(len(types) AS BIGINT) AS n_types,
         |  array_to_string(types[1:2], ',') AS first_two,
         |  list_contains(types, 'purchase') AS has_purchase
         |FROM (SELECT user_id, list_sort(list(DISTINCT event_type)) AS types
         |      FROM events GROUP BY user_id)
         |${orderBySql("user_id", "n_types", "first_two", "has_purchase")}""".stripMargin,

    "json1_props_extract" ->
      s"""SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) % 10 AS k_bucket,
         |  count(*) AS n
         |FROM events GROUP BY 1
         |${orderBySql("k_bucket", "n")}""".stripMargin,

    "geo1_roi" ->
      s"""SELECT event_type,
         |  CAST(sum(CASE WHEN d2 >= 20.0*20.0 AND d2 <= 80.0*80.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_annulus,
         |  CAST(sum(CASE WHEN (s0 >= 0 AND s1 >= 0 AND s2 >= 0 AND s3 >= 0)
         |                  OR (s0 <= 0 AND s1 <= 0 AND s2 <= 0 AND s3 <= 0)
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_quad,
         |  count(*) AS n
         |FROM (
         |  SELECT event_type,
         |    (x-100.0)*(x-100.0) + (y-5.0)*(y-5.0) AS d2,
         |    100.0*(y-0.0) - 0.0*(x-50.0) AS s0,
         |    0.0*(y-0.0) - 10.0*(x-150.0) AS s1,
         |    (-100.0)*(y-10.0) - 0.0*(x-150.0) AS s2,
         |    0.0*(y-10.0) - (-10.0)*(x-50.0) AS s3
         |  FROM (SELECT event_type, value AS x,
         |          CAST(user_id % 100 AS DOUBLE)/10.0 AS y FROM events))
         |GROUP BY event_type
         |${orderBySql("event_type", "n_annulus", "n_quad", "n")}""".stripMargin,

    "s2_catalog_discovery" ->
      s"""SELECT regexp_extract(filename, '(sf[0-9.]+)/events\\.parquet', 1) AS chunk,
         |  count(*) AS n_rows, min(ts) AS chunk_start, max(ts) AS chunk_end
         |FROM read_parquet('{SFDIR}/events.parquet', filename=true)
         |GROUP BY 1
         |${orderBySql("chunk", "n_rows", "chunk_start", "chunk_end")}""".stripMargin,

    "s5_json_config" ->
      s"""SELECT experiment,
         |  ActiveRegion.ArenaInnerRadius AS r_inner,
         |  ActiveRegion.ArenaOuterRadius AS r_outer,
         |  ActiveRegion.ArenaCenter.X AS cx,
         |  CAST(Devices.VideoController.TriggerFrequency AS BIGINT) AS fps
         |FROM read_json_auto('/tmp/graft_json_cfg/metadata.json')
         |${orderBySql("experiment", "r_inner", "r_outer", "cx", "fps")}""".stripMargin,

    "s10_clip_manifest" ->
      s"""WITH $sessSql,
         |sessions AS (
         |  SELECT user_id, session_id, min(ts) AS start_ts, max(ts) AS end_ts, count(*) AS n
         |  FROM sess GROUP BY user_id, session_id HAVING count(*) >= 20)
         |SELECT user_id,
         |  start_ts - INTERVAL 5 SECOND AS clip_start,
         |  end_ts + INTERVAL 5 SECOND AS clip_end,
         |  printf('clip_u%d_%s.avi', user_id, strftime(start_ts, '%Y-%m-%dT%H-%M-%S')) AS clip_name
         |FROM sessions
         |${orderBySql("user_id", "clip_start", "clip_end", "clip_name")}""".stripMargin,

    "j2_asof_forward" ->
      s"""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         |     v AS (SELECT event_id AS view_id, user_id, ts FROM events WHERE event_type = 'view')
         |SELECT p.event_id AS event_id, p.user_id AS user_id, v.view_id AS view_id,
         |  round((epoch_us(v.ts) - epoch_us(p.ts)) / 1000000.0, 6) AS delta_sec
         |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
         |WHERE epoch_us(v.ts) - epoch_us(p.ts) <= 172800000000
         |${orderBySql("event_id", "user_id", "view_id", "delta_sec")}""".stripMargin,

    "geo2_kinematics" ->
      s"""SELECT event_id, user_id,
         |  round(sqrt(dx*dx + dy*dy), 6) AS dist,
         |  round(((degrees(atan2(dy, dx)) % 360.0) + 360.0) % 360.0, 6) AS orient_deg,
         |  round(sqrt(dx*dx + dy*dy) / dt, 9) AS speed
         |FROM (
         |  SELECT event_id, user_id, x - px AS dx, y - py AS dy,
         |    (epoch_us(ts) - epoch_us(pts)) / 1000000.0 AS dt
         |  FROM (
         |    SELECT event_id, user_id, ts, x, y,
         |      lag(x) OVER w AS px, lag(y) OVER w AS py, lag(ts) OVER w AS pts
         |    FROM (SELECT event_id, user_id, ts, value AS x,
         |            CAST(user_id % 100 AS DOUBLE)/10.0 AS y FROM events)
         |    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         |  WHERE px IS NOT NULL)
         |${orderBySql("event_id", "user_id", "dist", "orient_deg", "speed")}""".stripMargin
  )
}
