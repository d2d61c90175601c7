package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Rebalance-before-CPU-bound-work helper. A small corpus arrives as one
  * parquet file = one partition, which would serialize per-row kernels
  * (shingling, digesting, decoding) on a single thread — but an already
  * well-partitioned 100 TB input must NOT pay a gratuitous full shuffle of
  * its payload, so the repartition only happens when the input has fewer
  * partitions than the cluster has slots.
  */
object Spread {
  def byKey(df: DataFrame, key: Column): DataFrame = {
    // streaming frames can't be probed via .rdd (batch planning) — and a
    // micro-batch's partitioning is the source's concern, so pass through
    if (df.isStreaming) return df
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < parallelism) df.repartition(parallelism, key) else df
  }
}
