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

  def releaseAll(): Unit = synchronized {
    persisted.foreach(_.unpersist(blocking = false))
    persisted.clear()
  }
}
