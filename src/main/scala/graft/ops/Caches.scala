package graft.ops

import org.apache.spark.sql.DataFrame

/** Registry for persisted intermediates so a long-lived session running
  * many queries (the driver's harness) can release them between queries
  * instead of accumulating cached blocks. Single-query sessions never need
  * to call [[releaseAll]].
  */
object Caches {
  private val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  def trackPersist(df: DataFrame): DataFrame = synchronized {
    persisted += df
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** [[trackPersist]] that passes a STREAMING plan through unpersisted —
    * persist on a streaming frame throws AnalysisException, and the ops
    * that cache multi-branch inputs (spearman, macroAuc,
    * classificationCounts) are legitimate micro-batch citizens whose
    * foreachBatch frames ARE batch; only a genuinely streaming plan skips.
    */
  def trackPersistBatch(df: DataFrame): DataFrame =
    if (df.isStreaming) df else trackPersist(df)

  def releaseAll(): Unit = synchronized {
    persisted.foreach(_.unpersist(blocking = false))
    persisted.clear()
  }
}
