package org.apache.spark.sql.graftx

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Build a DataFrame from an RDD[InternalRow] (the private[sql]
  * internalCreateDataFrame), so InternalRow-level kernels (broadcast
  * interval join, as-of binary search) can skip the external-Row
  * serde round trip that `df.rdd` + `createDataFrame` pays twice.
  */
object InternalRows {
  def create(spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
