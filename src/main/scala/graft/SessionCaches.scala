package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared sweep for the session-scoped (session, corpus) → persisted-
  * DataFrame memos (Dedup's shingle/pair/cluster frames, Similarity's
  * IVF scoring frame): unpersist and drop every entry belonging to one
  * session. One implementation so the lifecycle hooks in the modules
  * cannot drift. */
object SessionCaches {

  def clear(spark: SparkSession,
            maps: Seq[ConcurrentHashMap[(SparkSession, String), DataFrame]]): Unit =
    maps.foreach { m =>
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._1 eq spark) { e.getValue.unpersist(); it.remove() }
      }
    }
}
