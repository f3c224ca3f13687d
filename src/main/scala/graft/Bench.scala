package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Bench runner: executes every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * emits one JSON line with per-query wall seconds.
  *
  * Each query is fully materialized through a `noop`-format write (not
  * `.count()`): count() lets Catalyst prune every projected column, so
  * pure-projection queries would benchmark a scan instead of their math.
  *
  * Noise control: every query runs `SPARK_GRAFT_BENCH_REPS` times (default
  * 2) and the MINIMUM is recorded — sf0.1 totals on a shared box swing
  * 30–50% run to run, and the min is the stable statistic. A query that
  * throws is recorded as -1 and listed in "failed", never summed into the
  * total, so a broken query cannot make the bench look faster.
  *
  * The JSON line is written to bench_out.json in the cwd AND printed to the
  * RAW process stdout (FileDescriptor.out, bypassing sbt's [info]-prefixing
  * logger) so the harness can json-parse the line either way.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: pay JVM/codegen/parquet-reader initialization once, outside
    // the measured loop, so the first query's time is its own.
    try Tables.events(spark, sfDir).limit(10000)
      .groupBy("event_type").count()
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        // operators cache intermediate tables (shingle sets etc.); drop
        // them between runs so storage memory doesn't accumulate across
        // 72 queries × reps
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    // COMPACT line: the harness captures only the TAIL of process output
    // and json-parses the line it finds there — a line over ~2k chars gets
    // its head truncated and parses as nothing. At 77 queries the
    // 3-decimal form measured 1962 chars — inside the hazard margin — so
    // per-query values print at 2 decimals (10 ms resolution, well below
    // the 30–50 % run-to-run noise floor).
    // Locale.ROOT: the default-locale f-interpolator would print a comma
    // decimal separator on e.g. de_DE JVMs — invalid JSON
    def f3(v: Double) =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, -1.0) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // numeric sf parsed from the dir name (…/sf0.1 → 0.1); -1 if unparseable
    // strict number shape: "sf2.5.1" or "sf1." must not splice invalid JSON
    val sfNum = "sf([0-9]+(?:\\.[0-9]+)?)$".r.findFirstMatchIn(sfDir)
      .map(_.group(1)).getOrElse("-1")
    // cpus is quoted: it is an env-provided STRING ("*" is a legal value
    // for local[*]) and splicing it bare would emit invalid JSON
    val line = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"failed":$failed,"sf":$sfNum,"reps":$reps,"cpus":"${cpus.replaceAll("[\"\\\\]", "")}","ts":${System.currentTimeMillis / 1000}}"""
    // The FILE line additionally carries the DuckDB oracle's per-query
    // seconds (tools/duck_bench.py writes oracle_bench.json, a flat
    // name→sec map) so per-query slower-than-baseline adjudication
    // compares same-box runs, not a stale total. File line only: the
    // stdout line must stay under the harness's ~2k-char tail-parse
    // limit, and the oracle map would double it.
    // duck_bench.py stamps {"sf":…,"ts":…,"queries":{…}} — the sf must
    // match THIS run's, so a stale file from a different scale factor is
    // never recorded as this run's same-box oracle; the inner queries
    // object must be brace-shaped so malformed content cannot corrupt
    // the appended JSON line. (Legacy un-stamped flat maps fail the sf
    // check and are skipped — re-run duck_bench.py to refresh.)
    val oracleMap = scala.util.Try {
      val s = Files.readString(Paths.get("oracle_bench.json")).trim
      val sfOk = """"sf":([0-9.eE+-]+)""".r.findFirstMatchIn(s)
        .exists(_.group(1) == sfNum)
      val ts = """"ts":([0-9]+)""".r.findFirstMatchIn(s).map(_.group(1))
      val qStart = s.indexOf("\"queries\":")
      val q = if (qStart < 0) "" else
        s.substring(qStart + "\"queries\":".length).stripSuffix("}").trim
      if (s.startsWith("{") && sfOk && ts.isDefined &&
          q.startsWith("{") && q.endsWith("}"))
        Some((q, ts.get))
      else None
    }.toOption.flatten
    val fileLine = oracleMap match {
      case Some((m, ots)) =>
        line.stripSuffix("}") + s""","oracle":$m,"oracle_ts":$ots}"""
      case None => line
    }
    // APPEND, never overwrite: each run is one labeled line (reps/cpus/ts),
    // so drift disputes can compare runs instead of archaeology through
    // git history for the previous number
    try Files.writeString(Paths.get("bench_out.json"), fileLine + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    catch { case _: Throwable => () }
    // raw stdout: visible as a clean line even under sbt's logger
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(line)
    println(line)
    spark.stop()
  }
}
