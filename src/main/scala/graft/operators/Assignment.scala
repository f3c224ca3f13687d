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

  /** Finite stand-in for infeasible cells: padding with a uniform big cost
    * (instead of aborting augmentation mid-way, which corrupts the dual
    * potentials) yields the min-cost **maximum-cardinality** matching over
    * the feasible cells, matching the reference's reduce-then-solve
    * semantics. The pad is SCALED to the data (a fixed 1e15 has ulp 0.125;
    * subtracting potentials of that magnitude erodes ~0.1 of precision per
    * augmentation hop, enough to mis-rank finite costs that differ by
    * less — e.g. two likelihood-derived costs 0.05 apart).
    *
    * The factor 2 makes the pad dominate NEGATIVE finite costs too:
    * maximum-cardinality requires that adding one more real match always
    * beats leaving a pad cell in the solution, i.e. big > (total finite
    * swing) = 2·n·maxAbs. With big = 2·(maxAbs+1)·(n+1) a cardinality-k
    * solution with one extra pad cell costs at least
    * big - n·maxAbs > n·maxAbs ≥ any all-finite cardinality-(k+1) cost.
    * (A pad of (maxAbs+1)·(n+1) fails on e.g. rows
    * [[10,-10,∞],[∞,10,-10],[∞,∞,10]]: the padded 2-matching at -20+44
    * beats the 3-matching at 30.) */
  private def bigFor(cost: Array[Array[Double]], n: Int): Double = {
    var maxAbs = 0.0
    cost.foreach(_.foreach { v =>
      if (!v.isInfinity && !v.isNaN && math.abs(v) > maxAbs) maxAbs = math.abs(v)
    })
    2.0 * (maxAbs + 1.0) * (n + 1)
  }

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
    // any non-finite cell = infeasible (a bare NaN would poison the delta
    // search and crash the augmentation; a -Infinity would corrupt duals)
    val big = bigFor(cost, math.min(nRows, nCols))
    val c = Array.tabulate(nRows, nCols)((i, j) =>
      if (!java.lang.Double.isFinite(cost(i)(j))) big else cost(i)(j))
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
            val cur = c(i0 - 1)(j - 1) - u(i0) - v(j)
            if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
            if (minv(j) < delta) { delta = minv(j); j1 = j }
          }
          j += 1
        }
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
      i += 1
    }
    // drop matches that landed on padded (infeasible) cells
    val res = Array.fill(nRows)(-1)
    var j = 1
    while (j <= nCols) {
      if (p(j) > 0 && java.lang.Double.isFinite(cost(p(j) - 1)(j - 1)))
        res(p(j) - 1) = j - 1
      j += 1
    }
    res
  }

  /** Assign per group from a candidate-pair DataFrame.
    *
    * Key types are preserved end-to-end: the kernel returns *indices into the
    * collected candidate array* and the output projects the original typed
    * values back out with `element_at` — no string casts, so numeric keys
    * stay numeric and join back cleanly. Rows with a null left/right key or
    * a null cost are infeasible and dropped up front. Tie-breaking is made
    * deterministic by sorting the candidate list on a stable representation
    * before building the cost matrix (order only — values are untouched).
    *
    * @param pairs     columns: groupCols ++ (leftKey, rightKey, costCol);
    *                  absent pairs are infeasible. An entity that exists but
    *                  has no feasible partner can be declared with a
    *                  `Double.PositiveInfinity`-cost pair (the reference's
    *                  full cost matrix shape) — it then participates in
    *                  singleton inference without ever being matched.
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
    // Returns (leftPairIdx, rightPairIdx, inferred): indices of the candidate
    // rows supplying the left and right key values. For a solved match both
    // indices point at the matched pair (its min-cost duplicate); for an
    // inferred singleton they point at any row carrying that key.
    val solveGroup = udf { (rows: Seq[Row]) =>
      val order = rows.indices.sortBy { i =>
        val r = rows(i)
        (String.valueOf(r.get(0)), String.valueOf(r.get(1)), r.getDouble(2))
      }
      val lefts = mutable.LinkedHashMap.empty[Any, Int]  // value → row index of first sighting
      val rights = mutable.LinkedHashMap.empty[Any, Int]
      order.foreach { i =>
        val r = rows(i)
        if (!lefts.contains(r.get(0))) lefts(r.get(0)) = i
        if (!rights.contains(r.get(1))) rights(r.get(1)) = i
      }
      val lKeys = lefts.keys.toArray
      val rKeys = rights.keys.toArray
      val lIdx = lKeys.zipWithIndex.toMap
      val rIdx = rKeys.zipWithIndex.toMap
      val cost = Array.fill(lKeys.length, rKeys.length)(Double.PositiveInfinity)
      val bestRow = Array.fill(lKeys.length, rKeys.length)(-1)
      order.foreach { k =>
        val r = rows(k)
        val c = r.getDouble(2)
        val i = lIdx(r.get(0)); val j = rIdx(r.get(1))
        if (c < cost(i)(j)) { cost(i)(j) = c; bestRow(i)(j) = k }
      }
      val m = solve(cost)
      val out = mutable.ArrayBuffer.empty[(Int, Int, Boolean)]
      m.zipWithIndex.foreach { case (j, i) =>
        if (j >= 0) out += ((bestRow(i)(j), bestRow(i)(j), false))
      }
      if (inferSingletons) {
        val unassignedL = lKeys.indices.filter(m(_) < 0)
        val assignedR = m.filter(_ >= 0).toSet
        val unassignedR = rKeys.indices.filterNot(assignedR)
        if (unassignedL.size == 1 && unassignedR.size == 1)
          out += ((lefts(lKeys(unassignedL.head)), rights(rKeys(unassignedR.head)), true))
      }
      out.toSeq
    }
    val gc = groupCols.map(col)
    // null-check the CAST value: a non-numeric cost string casts to null
    // AFTER an isNotNull on the raw column would have passed, and a null
    // inside the collected struct NPEs in the solver kernel
    val castCost = col(costCol).cast("double")
    val feasible = pairs.filter(
      col(leftKey).isNotNull && col(rightKey).isNotNull && castCost.isNotNull)
    feasible
      .groupBy(gc: _*)
      .agg(collect_list(struct(
        col(leftKey), col(rightKey),
        castCost.as(costCol))).as("_pairs"))
      .select((gc ++ Seq(col("_pairs"), explode(solveGroup(col("_pairs"))).as("_m"))): _*)
      .select((gc ++ Seq(
        element_at(col("_pairs"), col("_m._1") + 1)(leftKey).as(leftKey),
        element_at(col("_pairs"), col("_m._2") + 1)(rightKey).as(rightKey),
        when(!col("_m._3"),
          element_at(col("_pairs"), col("_m._1") + 1)(costCol)).as(costCol))): _*)
  }
}
