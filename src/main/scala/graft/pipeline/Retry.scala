package graft.pipeline

import scala.util.control.NonFatal

/** Job-level retry with exponential backoff — the engine twin of the
  * reference's tenacity policy (`src/db/connection.py:125-129`:
  * `stop_after_attempt(3)`, `wait_exponential(multiplier=1, min=1,
  * max=10)`, retry only on the transient error class). Spark already
  * retries TASKS (`spark.task.maxFailures`); this wraps whole
  * driver-side ACTIONS — a TxTable publish losing a CAS race, a
  * flaky remote FS listing — where the unit of retry is the job, not
  * the task. The retry predicate defaults to NonFatal-but-retryable
  * left to the caller, exactly as tenacity retries only
  * OperationalError: retrying a DETERMINISTIC failure (analysis error,
  * corrupt input) would just triple its cost.
  */
object Retry {

  /** tenacity wait_exponential(multiplier=1, min=1, max=10), seconds →
    * ms: attempt k (1-based) waits min(max(2^(k-1), 1), 10) seconds.
    */
  def expBackoffMs(attempt: Int, minMs: Long = 1000L, maxMs: Long = 10000L): Long =
    math.min(math.max(1000L * (1L << (attempt - 1)), minMs), maxMs)

  /** Run `f`, retrying up to `attempts` total tries on failures where
    * `retryOn` holds; rethrows the last failure otherwise/afterwards.
    * `sleeper` is injected so specs assert the exact backoff schedule
    * without waiting it out.
    */
  def withBackoff[T](
      attempts: Int = 3,
      minMs: Long = 1000L,
      maxMs: Long = 10000L,
      retryOn: Throwable => Boolean = NonFatal(_),
      sleeper: Long => Unit = Thread.sleep)(f: => T): T = {
    var attempt = 1
    while (true) {
      try return f
      catch {
        case e: Throwable if attempt < attempts && retryOn(e) =>
          sleeper(expBackoffMs(attempt, minMs, maxMs))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
