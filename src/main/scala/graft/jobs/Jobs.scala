package graft.jobs

import scala.annotation.tailrec

/** Job execution layer — the engine's form of the reference's Step
  * Function orchestration (stepfunction/definition.json:14-24: retry on
  * timeout/unknown with IntervalSeconds=30, BackoffRate=1,
  * MaxAttempts=10).
  *
  * Spark actions driven through runWithRetry must be idempotent — the
  * engine's sinks are (dynamic partition overwrite in PartitionedSink),
  * so a re-run after a mid-write failure converges to the same state.
  */
object Jobs {

  final case class RetryPolicy(maxAttempts: Int = 10,
                               intervalMs: Long = 30000,
                               backoffRate: Double = 1.0,
                               retryOn: Throwable => Boolean = _ => true)

  final class RetriesExhausted(val attempts: Int, cause: Throwable)
      extends RuntimeException(s"job failed after $attempts attempts", cause)

  /** Run `job`, retrying per `policy`. `sleep` is injectable for tests. */
  def runWithRetry[T](policy: RetryPolicy = RetryPolicy(),
                      sleep: Long => Unit = Thread.sleep)(job: => T): T = {
    @tailrec
    def attempt(n: Int, delayMs: Long): T = {
      val result =
        try Right(job)
        catch {
          case e: Throwable if policy.retryOn(e) && n < policy.maxAttempts => Left(e)
          case e: Throwable => throw new RetriesExhausted(n, e)
        }
      result match {
        case Right(v) => v
        case Left(_) =>
          sleep(delayMs)
          attempt(n + 1, (delayMs * policy.backoffRate).toLong)
      }
    }
    attempt(1, policy.intervalMs)
  }
}
