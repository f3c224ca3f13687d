package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** DataFrame ⇄ RDD[InternalRow] bridge for the engine's per-partition
  * kernels that must consume TUNGSTEN rows directly (UTF8String views —
  * no java String materialization, no encoder copy). The typed
  * `Dataset[T].mapPartitions` route deserializes every row into JVM
  * objects; for token-counting kernels over corpus text that copy was
  * the dominant cost (measured ~2× at sf1). These utilities are
  * `private[sql]` in Spark, hence this shim inside the sql package —
  * the [[ColumnBridge]] convention.
  *
  * CONTRACT for `toInternalRdd` consumers: rows (and any UTF8String
  * views over them) are REUSED buffers — copy (`UTF8String.clone`)
  * anything that outlives the current row.
  */
object PlanBridge {
  /** The optimized physical plan's output rows (column pruning and
    * filter pushdown apply as usual). */
  def toInternalRdd(df: DataFrame): RDD[InternalRow] =
    df.queryExecution.toRdd

  /** Wrap kernel output rows back into a DataFrame. */
  def fromInternalRdd(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
