package graft

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** SQL façade (SURVEY §7.1 item 9 / §7.3 stretch): register the
  * scale-factor tables as temp views AND expose the typed operator kernels
  * to `spark.sql(...)` so a SQL-only user can run them:
  *
  *   - `graft_sessionize(sort_array(collect_list(us)), gapUs)` → per-element
  *     session ids for an ascending epoch-micros array (the G1 gap rule);
  *     pair back with `arrays_zip` + `inline`;
  *   - `graft_assign(collect_list(struct(l, r, cost)))` → matched
  *     `array<struct<l,r,cost>>` per group under optimal min-cost
  *     assignment (J3; infeasible = +Infinity cost, like the Scala API);
  *     explode with `inline`.
  *
  * The §2.8 scalar surface (string/date/math/array/map/JSON) is Spark SQL
  * built-ins and needs no registration. DataFrame-valued operators
  * (as-of/band joins, detectors) interleave with SQL via
  * `df.createOrReplaceTempView`.
  */
object GraftSql {
  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach { t =>
      try Tables.table(spark, dir, t).createOrReplaceTempView(t)
      catch { case _: Throwable => () } // tolerate absent tables
    }
    registerFunctions(spark)
  }

  /** Register the SQL-callable operator kernels (idempotent). */
  def registerFunctions(spark: SparkSession): Unit = {
    spark.udf.register("graft_sessionize",
      (times: Seq[Long], gapUs: Long) => {
        var sid = 0L
        var prev = Long.MinValue
        times.map { t =>
          if (prev != Long.MinValue && t - prev > gapUs) sid += 1
          prev = t
          sid
        }
      })
    spark.udf.register("graft_assign",
      (pairs: Seq[(Long, String, Double)]) => {
        // same deterministic ordering discipline as Assignment.assign —
        // including its STRING ordering of keys, so equal-cost tie-breaks
        // agree between the SQL facade and the Scala API
        val rows = pairs.toArray
          .sortBy { case (l, r, c) => (String.valueOf(l), r, c) }
        val lefts = mutable.LinkedHashMap.empty[Long, Int]
        val rights = mutable.LinkedHashMap.empty[String, Int]
        rows.foreach { case (l, r, _) =>
          if (!lefts.contains(l)) lefts(l) = lefts.size
          if (!rights.contains(r)) rights(r) = rights.size
        }
        val cost = Array.fill(lefts.size, rights.size)(Double.PositiveInfinity)
        rows.foreach { case (l, r, c) =>
          val i = lefts(l); val j = rights(r)
          if (c < cost(i)(j)) cost(i)(j) = c
        }
        val m = graft.operators.Assignment.solve(cost)
        val lKeys = lefts.keys.toArray
        val rKeys = rights.keys.toArray
        m.zipWithIndex.collect { case (j, i) if j >= 0 =>
          (lKeys(i), rKeys(j), cost(i)(j))
        }.toSeq
      })
  }
}
