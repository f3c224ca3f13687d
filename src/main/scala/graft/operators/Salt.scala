package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed (one
  * camera, one hot user, one hot shingle…). AQE's skew-join split handles
  * sort-merge cases at runtime; explicit salting is the static alternative
  * when a key is SO hot that even split partitions overwhelm a task, and it
  * composes with any join type.
  *
  * Shape: the skewed (large) side gets a deterministic salt in [0, S) from
  * its row identity; the small side is replicated S× with every salt value;
  * the join key becomes (key, salt). Each hot key now spreads over S tasks.
  */
object Salt {

  /** Deterministic salt from arbitrary identity columns (no rand(): results
    * stay reproducible run-to-run). */
  def saltCol(saltFactor: Int, identityCols: Column*): Column =
    pmod(xxhash64(identityCols: _*), lit(saltFactor.toLong)).cast("int")

  /** Equi-join `large ⋈ small` on `keys`, salted S ways. `identityCols`
    * picks the large side's salt (any columns unique-ish per row).
    *
    * Join types preserving small-side rows (right/full outer) are rejected:
    * the small side is replicated S×, so an unmatched small-side row would
    * surface S times instead of once. */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int, identityCols: Seq[String],
      joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    // Locale.ROOT: "RIGHT".toLowerCase under a Turkish-locale JVM maps
    // I→ı and would slip past the guard below
    val jt = joinType.toLowerCase(java.util.Locale.ROOT).replace("_", "")
    require(!jt.contains("right") && !jt.contains("full") && !jt.contains("outer")
        || jt == "leftouter",
      s"saltedJoin cannot preserve unmatched small-side rows (joinType=$joinType)")
    val l = large.withColumn("_salt", saltCol(saltFactor, identityCols.map(col): _*))
    val s = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    l.join(s, keys :+ "_salt", joinType).drop("_salt")
  }
}
