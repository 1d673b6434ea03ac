package graft.ops

/** Per-JVM memo for trained artifacts shared across `SparkEntry`
  * queries in one Verify/Bench session — the [[OracleDump]] convention
  * extended one step: when several registered queries apply the SAME
  * trained model (a tokenizer vocab, a BPE merge table), the training
  * runs once per (artifact, sfDir) and every query reads the identical
  * value. That keeps a bench run from re-paying in-query training per
  * query (the r9 verdict's "bench tax") without weakening the
  * correctness story: the memoized value is a plain driver-side value
  * (a Map / Seq — never a lazily recomputable DataFrame, which could
  * diverge between dump and query; DataFrame-shaped models must be
  * eager-checkpointed BEFORE memoization, the SgnsOps precedent), and
  * both the OracleDump and the query aggregates derive from that one
  * value, so the compare is as strict as ever.
  *
  * Keyed by (artifact name, sfDir): verify at sf0.01 and bench at
  * sf0.1 never cross-contaminate, and a second SF sweep retrains.
  * Bounded: a handful of tokenizer-sized values per JVM.
  */
object TrainedCache {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), AnyRef]()

  /** The third key component: the live SparkContext's applicationId.
    * DataFrame-shaped artifacts (deepwalkPairs) are localCheckpoint'd,
    * i.e. bound to the executors of the session that trained them — if
    * the session is stopped and a new one created in the same JVM, a
    * (name, sfDir)-only hit would hand consumers a frame referencing
    * dead RDD blocks. Keying on applicationId makes a recreated
    * session a clean miss (retrain) instead of an opaque failure. */
  private def sessionTag: String =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .filter(!_.sparkContext.isStopped)
      .map(_.sparkContext.applicationId)
      .getOrElse("no-session")

  /** Memoized `train` per (name, sfDir, session). `train` may run more
    * than once under a concurrent race (computeIfAbsent would hold the
    * map lock across a Spark job); the race loser returns the WINNER's
    * value (putIfAbsent), so every caller observes one object — for
    * DataFrame-shaped artifacts that means one materialization, not
    * two value-identical checkpoints. */
  def getOrTrain[T <: AnyRef](name: String, sfDir: String)(train: => T): T = {
    val k = (name, sfDir, sessionTag)
    val hit = cache.get(k)
    if (hit != null) hit.asInstanceOf[T]
    else {
      // evict dead-session entries on the miss path: one live session
      // per JVM in this codebase, so a miss under a NEW applicationId
      // means every entry tagged otherwise references a stopped
      // context's checkpoint blocks — unreachable forever, and a
      // long-lived JVM cycling sessions would accumulate them without
      // bound. ConcurrentHashMap's keySet iterator supports remove.
      val it = cache.keySet.iterator
      while (it.hasNext) if (it.next()._3 != k._3) it.remove()
      val v = train
      val prev = cache.putIfAbsent(k, v)
      (if (prev != null) prev else v).asInstanceOf[T]
    }
  }

  /** Test hook: drop everything (spec isolation). */
  def clear(): Unit = cache.clear()
}
