package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/**
 * InternalRow-level entry/exit for DataFrames. Spark 4 keeps
 * `internalCreateDataFrame` `private[sql]` on the classic session, so
 * operators that process partitions with primitive-layout code (no
 * row-object encoders, no boxing — e.g. the connected-components
 * union-find step) need this one-file package escape hatch, exactly
 * like [[ColumnBridge]] does for Column <-> Expression.
 */
object InternalRowBridge {
  /** The query's executed RDD of (Unsafe) InternalRows — zero decode:
    * `getLong`/`getDouble` read the Tungsten buffer directly. */
  def toInternalRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[Dataset[_]].queryExecution.toRdd

  /** Wrap an RDD of InternalRows (callers must hand over immutable
    * rows — copy any reused UnsafeRow buffer) as a DataFrame. */
  def fromInternalRdd(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
