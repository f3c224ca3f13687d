package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.functions.Cols

/** Diagnostic main for geo3_quadrant_select's sf1 wall (VERDICT r11
  * What's-wrong 3: 14 s vs DuckDB 0.7 s): splits the query into its
  * stages — scan+math, +sort, +noop write — and prints per-stage walls
  * plus the codegen status of the math stage. Run:
  * `SPARK_GRAFT_SF_DIR=local/sf1 sbt "runMain graft.GeoProbe"`. */
object GeoProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "local/sf1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"GEO_PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val q = SparkEntry.queries("geo3_quadrant_select")
    // warm the reader
    Tables.events(spark, sfDir).limit(10000).count()

    val full = q(spark, sfDir)
    time("full_sorted_noop") {
      full.write.format("noop").mode("overwrite").save()
    }
    // the query body without the final sortAll, rebuilt inline
    val e = Tables.events(spark, sfDir)
    val pos = e.select(col("event_id"), (col("value") * 2).as("x"),
      ((col("user_id") % 100).cast("double") * 2).as("y"))
    val homos = Seq(
      Seq(1.0, 0, 0, 0, 1, 0, 0, 0, 1), Seq(1.0, 0, 100, 0, 1, 0, 0, 0, 1),
      Seq(1.0, 0, 0, 0, 1, 100, 0, 0, 1), Seq(1.0, 0, 100, 0, 1, 100, 0, 0, 1))
    val fovs = homos.map(h => graft.operators.Quadrants.fovCorners(h, 100, 100))
    val qd = graft.operators.Quadrants.withQuadrants(pos, "x", "y", fovs)
      .select(col("event_id"),
        col("n_possible_quadrants").as("n_possible"),
        col("most_central_quadrant").as("most_central"))
    time("math_noop") {
      qd.write.format("noop").mode("overwrite").save()
    }
    time("scan_noop") {
      pos.write.format("noop").mode("overwrite").save()
    }
    time("sort_only_noop") {
      queries.Q.sortAll(pos).write.format("noop").mode("overwrite").save()
    }
    // post-execution plan: AQE has finalized, codegen stages are real
    val plan = full.queryExecution.executedPlan.toString
    val wsc = plan.linesIterator.count(_.contains("WholeStageCodegen"))
    println(s"GEO_PROBE wholestage_spans=$wsc")

    // bisect: which column knocks codegen out?
    val onlyN = qd.select("event_id", "n_possible")
    time("math_n_possible_only") {
      onlyN.write.format("noop").mode("overwrite").save()
    }
    println("GEO_PROBE n_possible_spans=" + onlyN.queryExecution.executedPlan
      .toString.linesIterator.count(_.contains("WholeStageCodegen")))
    val onlyC = qd.select("event_id", "most_central")
    time("math_most_central_only") {
      onlyC.write.format("noop").mode("overwrite").save()
    }
    println("GEO_PROBE most_central_spans=" + onlyC.queryExecution.executedPlan
      .toString.linesIterator.count(_.contains("WholeStageCodegen")))
    println("GEO_PROBE codegenString follows")
    println(org.apache.spark.sql.execution.debug.codegenString(
      onlyC.queryExecution.executedPlan).linesIterator
      .filter(l => l.startsWith("*") || l.startsWith("==") ||
        l.contains("Found"))
      .map(_.take(100)).take(12).mkString("\n"))

    // micro-bisect most_central's pieces
    val ins = fovs.indices.map(i => Cols.inConvexPolygon(col("x"), col("y"),
      fovs(i)))
    val ds = fovs.indices.map { i =>
      val (cx, cy) = graft.operators.Quadrants.fovCenter(fovs(i))
      (col("x") - cx) * (col("x") - cx) + (col("y") - cy) * (col("y") - cy)
    }
    time("bisect_insides_only") {
      pos.select(col("event_id"),
        ins.map(_.cast("int")).reduce(_ + _).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    time("bisect_least_d_only") {
      pos.select(col("event_id"), least(ds: _*).as("dmin"))
        .write.format("noop").mode("overwrite").save()
    }
    val none2 = !ins.reduce(_ || _)
    val masked2 = fovs.indices.map(i =>
      when(none2 || ins(i), ds(i)).otherwise(lit(Double.MaxValue)))
    time("bisect_least_masked") {
      pos.select(col("event_id"), least(masked2: _*).as("dmin"))
        .write.format("noop").mode("overwrite").save()
    }
    val dmin2 = least(masked2: _*)
    val chain2 = fovs.indices.init.foldRight(lit(fovs.size - 1): Column)(
      (i, rest) => when(masked2(i) === dmin2, lit(i)).otherwise(rest))
    time("bisect_full_chain") {
      pos.select(col("event_id"), chain2.as("mc"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
