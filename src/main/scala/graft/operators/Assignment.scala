package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Optimal bipartite assignment per group — SURVEY §2.3 J3/J4.
  *
  * The reference builds, per grid timestamp, a cost matrix of
  * (pose anchors × candidate identities) gated by a max-distance feasibility
  * test and solves it with `scipy.optimize.linear_sum_assignment`
  * (`pose_id_combine/step2_combining_SLEAP_predictions/combine_pose_id_chunk.py:83-134`);
  * if exactly one identity and one pose remain unassigned it pairs them
  * (`:136-141`).
  *
  * Engine shape: the caller produces a *candidate-pair* DataFrame
  * (group keys, left key, right key, cost) — typically via
  * [[BandJoin]] + column math, which keeps feasibility pruning in codegen —
  * and this operator solves one assignment per group. Groups are tiny
  * (≤ ~10 entities/frame) and independent, so the work is embarrassingly
  * parallel across a single shuffle; the O(n³) kernel is a driver-free
  * Jonker–Volgenant-style shortest-augmenting-path implementation.
  */
object Assignment {

  /** Solve min-cost assignment. `cost(i)(j)` may be
    * `Double.PositiveInfinity` for infeasible pairs. Returns for each row i
    * the assigned column, or -1 (unassigned / only infeasible options).
    * Shortest-augmenting-path with potentials, O(n²·m), n = rows ≤ m = cols
    * (callers may pass any shape; it is transposed internally if needed).
    */
  def solve(cost: Array[Array[Double]]): Array[Int] = {
    val nRows = cost.length
    if (nRows == 0) return Array.empty
    val nCols = cost(0).length
    if (nCols == 0) return Array.fill(nRows)(-1)
    if (nRows > nCols) {
      // transpose, solve, invert the matching
      val t = Array.tabulate(nCols, nRows)((j, i) => cost(i)(j))
      val colToRow = solve(t)
      val res = Array.fill(nRows)(-1)
      colToRow.zipWithIndex.foreach { case (i, j) => if (i >= 0) res(i) = j }
      return res
    }
    val INF = Double.PositiveInfinity
    val u = Array.fill(nRows + 1)(0.0)
    val v = Array.fill(nCols + 1)(0.0)
    val p = Array.fill(nCols + 1)(0) // p(j) = 1-based row matched to column j
    val way = Array.fill(nCols + 1)(0)
    var i = 1
    while (i <= nRows) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(nCols + 1)(INF)
      val used = Array.fill(nCols + 1)(false)
      var continue = true
      while (continue) {
        used(j0) = true
        val i0 = p(j0)
        var delta = INF
        var j1 = -1
        var j = 1
        while (j <= nCols) {
          if (!used(j)) {
            val cur = cost(i0 - 1)(j - 1) - u(i0) - v(j)
            if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
            if (minv(j) < delta) { delta = minv(j); j1 = j }
          }
          j += 1
        }
        if (j1 == -1 || delta == INF) {
          // no feasible augmenting path: leave row i unassigned
          p(0) = 0
          continue = false
        } else {
          var j2 = 0
          while (j2 <= nCols) {
            if (used(j2)) { u(p(j2)) += delta; v(j2) -= delta }
            else minv(j2) -= delta
            j2 += 1
          }
          j0 = j1
          if (p(j0) == 0) {
            // augment along the alternating path
            while (j0 != 0) {
              val j3 = way(j0)
              p(j0) = p(j3)
              j0 = j3
            }
            continue = false
          }
        }
      }
      i += 1
    }
    val res = Array.fill(nRows)(-1)
    var j = 1
    while (j <= nCols) {
      if (p(j) > 0 && cost(p(j) - 1)(j - 1) != INF) res(p(j) - 1) = j - 1
      j += 1
    }
    res
  }

  /** Assign per group from a candidate-pair DataFrame.
    *
    * @param pairs     columns: groupCols ++ (leftKey, rightKey, costCol);
    *                  absent pairs are infeasible
    * @param inferSingletons reference J4 rule: if after the optimal solve
    *                  exactly one left and one right key in the group remain
    *                  unassigned, pair them (their candidate pair need not
    *                  exist)
    * @return groupCols ++ (leftKey, rightKey, cost — null for inferred pairs)
    */
  def assign(
      pairs: DataFrame,
      groupCols: Seq[String],
      leftKey: String,
      rightKey: String,
      costCol: String,
      inferSingletons: Boolean = false): DataFrame = {
    val spark = pairs.sparkSession
    val solveGroup = udf { (rows: Seq[Row]) =>
      val lefts = rows.map(_.getAs[Any](0)).distinct.sortBy(_.toString)
      val rights = rows.map(_.getAs[Any](1)).distinct.sortBy(_.toString)
      val lIdx = lefts.zipWithIndex.toMap
      val rIdx = rights.zipWithIndex.toMap
      val cost = Array.fill(lefts.size, rights.size)(Double.PositiveInfinity)
      rows.foreach { r =>
        val c = r.getAs[Double](2)
        val i = lIdx(r.getAs[Any](0)); val j = rIdx(r.getAs[Any](1))
        if (c < cost(i)(j)) cost(i)(j) = c
      }
      val m = solve(cost)
      val out = mutable.ArrayBuffer.empty[(String, String, Option[Double])]
      m.zipWithIndex.foreach { case (j, i) =>
        if (j >= 0) out += ((lefts(i).toString, rights(j).toString, Some(cost(i)(j))))
      }
      if (inferSingletons) {
        val unassignedL = lefts.indices.filter(m(_) < 0)
        val assignedR = m.filter(_ >= 0).toSet
        val unassignedR = rights.indices.filterNot(assignedR)
        if (unassignedL.size == 1 && unassignedR.size == 1)
          out += ((lefts(unassignedL.head).toString, rights(unassignedR.head).toString, None))
      }
      out.toSeq
    }
    val gc = groupCols.map(col)
    pairs
      .groupBy(gc: _*)
      .agg(collect_list(struct(
        col(leftKey).cast("string"),
        col(rightKey).cast("string"),
        col(costCol).cast("double"))).as("_pairs"))
      .select((gc :+ explode(solveGroup(col("_pairs"))).as("_m")): _*)
      .select((gc ++ Seq(
        col("_m._1").as(leftKey),
        col("_m._2").as(rightKey),
        col("_m._3").as(costCol))): _*)
  }
}
