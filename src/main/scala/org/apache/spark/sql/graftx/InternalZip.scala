package org.apache.spark.sql.graftx

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.types.{LongType, StructType}

/** Dense global ordinal assignment WITHOUT the external-Row round trip.
  *
  * `df.rdd.zipWithIndex()` (the round-2..5 IndexBuild path) deserializes
  * every InternalRow to an external Row and `createDataFrame` re-encodes
  * it — two full serde passes over the corpus just to append one long
  * (guide §1.2 "per-task work": don't pay conversions the algorithm does
  * not need). This variant zips `queryExecution.toRdd` (UnsafeRow) and
  * appends the ordinal with one UnsafeProjection — same two jobs as
  * zipWithIndex (per-partition counts + the map), zero external-Row serde.
  *
  * Ordering contract is identical to `.rdd.zipWithIndex()`: partition
  * index order x within-partition row order. Callers must feed a plan
  * whose partitions are globally ordered (e.g. repartitionByRange +
  * sortWithinPartitions), exactly as before.
  */
object InternalZip {

  def withOrdinal(df: DataFrame, colName: String): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val outSchema = StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField(colName, LongType, nullable = false))
    val zipped = df.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      val proj = UnsafeProjection.create(outSchema)
      val joined = new JoinedRow
      val idxRow = new GenericInternalRow(1)
      it.map { case (row, i) =>
        idxRow.update(0, i)
        // projection output buffer is reused; copy so downstream caching
        // (the features cache fill) sees distinct rows
        proj(joined(row, idxRow)).copy(): InternalRow
      }
    }
    spark.internalCreateDataFrame(zipped, outSchema)
  }
}
