package graft.operators

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.behavior.Kernels
import graft.llm.TextStats

/** ScalaCheck properties for the pure kernels (run natively by sbt's
  * ScalaCheck framework — no Spark session needed). */
object KernelProps extends Properties("graft.kernels") {

  private val smallMatrix: Gen[Array[Array[Double]]] = for {
    n <- Gen.choose(1, 4)
    m <- Gen.choose(1, 4)
    cells <- Gen.listOfN(n * m, Gen.oneOf(
      Gen.choose(-50, 50).map(_.toDouble), Gen.const(Double.PositiveInfinity)))
  } yield cells.grouped(m).map(_.toArray).toArray

  property("solve: assignment is injective and feasible") = forAll(smallMatrix) { cost =>
    val res = Assignment.solve(cost)
    val used = res.filter(_ >= 0)
    used.distinct.length == used.length &&
      res.zipWithIndex.forall { case (j, i) => j < 0 || !cost(i)(j).isInfinity }
  }

  property("solve: transposing the matrix transposes the matching") = forAll(smallMatrix) { cost =>
    val n = cost.length; val m = cost(0).length
    val res = Assignment.solve(cost)
    val t = Array.tabulate(m, n)((j, i) => cost(i)(j))
    val resT = Assignment.solve(t)
    val pairs = res.zipWithIndex.collect { case (j, i) if j >= 0 => (i, j) }.toSet
    val pairsT = resT.zipWithIndex.collect { case (i, j) if i >= 0 => (i, j) }.toSet
    // both are optimal; totals must agree even if tie-broken differently
    val tot = pairs.toSeq.map { case (i, j) => cost(i)(j) }.sum
    val totT = pairsT.toSeq.map { case (i, j) => cost(i)(j) }.sum
    pairs.size == pairsT.size && math.abs(tot - totT) < 1e-9
  }

  property("solve: matches the exhaustive max-cardinality min-cost optimum") =
    forAll(smallMatrix) { cost =>
      val res = Assignment.solve(cost)
      val pairs = res.zipWithIndex.collect { case (j, i) if j >= 0 => (i, j) }
      val cardS = pairs.length
      val totS = pairs.map { case (i, j) => cost(i)(j) }.sum
      val n = cost.length; val m = cost(0).length
      var bestCard = -1; var bestCost = 0.0
      def rec(i: Int, used: Set[Int], card: Int, tot: Double): Unit =
        if (i == n) {
          if (card > bestCard || (card == bestCard && tot < bestCost - 1e-12)) {
            bestCard = card; bestCost = tot
          }
        } else {
          rec(i + 1, used, card, tot)
          var j = 0
          while (j < m) {
            if (!used(j) && !cost(i)(j).isPosInfinity)
              rec(i + 1, used + j, card + 1, tot + cost(i)(j))
            j += 1
          }
        }
      rec(0, Set.empty, 0, 0.0)
      Prop(cardS == bestCard && math.abs(totS - bestCost) < 1e-9) :|
        s"solver card=$cardS tot=$totS vs optimum card=$bestCard tot=$bestCost"
    }

  property("solve: negative finite costs never sacrifice cardinality") = {
    // regression: with pad = (maxAbs+1)(n+1) the padded 2-matching at
    // -20+44 = 24 beat the cardinality-3 diagonal at 30
    val inf = Double.PositiveInfinity
    val cost = Array(
      Array(10.0, -10.0, inf),
      Array(inf, 10.0, -10.0),
      Array(inf, inf, 10.0))
    val res = Assignment.solve(cost)
    Prop(res.sameElements(Array(0, 1, 2))) :| s"got ${res.mkString(",")}"
  }

  private val trajectory: Gen[Array[Double]] = for {
    n <- Gen.choose(2, 30)
    xs <- Gen.listOfN(n, Gen.frequency(
      9 -> Gen.choose(-100.0, 100.0), 1 -> Gen.const(Double.NaN)))
  } yield xs.toArray

  property("greedyCleanup: votes partition the decided frames") = forAll(
    trajectory, trajectory) { (a, b) =>
    val n = math.min(a.length, b.length)
    val (ax, bx) = (a.take(n), b.take(n))
    val c = Kernels.greedyCleanup(ax, ax, bx, bx, voteFirstFrame = false)
    // every decided frame votes exactly once; frame 0 and both-NaN frames don't
    val decided = (1 until n).count(i =>
      !((ax(i).isNaN || ax(i).isNaN) && (bx(i).isNaN || bx(i).isNaN)))
    c.votesSame + c.votesSwap == decided && c.swapped.length == n
  }

  property("winnow: sketch of a ⊆ sketch of (a concatenated into b)") = forAll(
    Gen.alphaStr.suchThat(_.length >= 20), Gen.alphaStr) { (a, pad) =>
    // every window-min hash of `a` also appears among the k-gram hashes of
    // pad+a, so heavy overlap survives prefixing (shift invariance core)
    val sa = TextStats.winnow(a, 8, 4).toSet
    val sAll = TextStats.winnow(pad + a + pad, 8, 4).toSet
    val overlap = if (sa.isEmpty) 1.0 else sa.intersect(sAll).size.toDouble / sa.size
    overlap >= 0.5
  }
}
