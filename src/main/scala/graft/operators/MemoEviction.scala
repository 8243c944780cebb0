package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memo cleanup: the operator memos
  * (ExtensionQueries/Contamination/SketchQueries) key cached relations
  * by SparkSession in object-level maps, which would pin a STOPPED
  * session — and every checkpointed frame it owns — for the life of the
  * JVM. Each memo registers one cleanup per (session, tag); it fires
  * when the session's SparkContext ends.
  */
private[operators] object MemoEviction {
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  def register(s: SparkSession, tag: String)(cleanup: () => Unit): Unit =
    if (registered.add((s, tag)))
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          cleanup()
          registered.remove((s, tag))
        }
      })
}
