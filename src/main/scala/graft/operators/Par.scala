package graft.operators

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration.Duration
import scala.util.control.NonFatal

/** Overlap two INDEPENDENT eager driver phases (artifact
  * checkpoints, model trainings) as concurrent Spark jobs — the
  * scheduler back-fills the tail of one job with the other's tasks,
  * so the two phases' driver-sync latencies overlap instead of
  * summing. Use ONLY for phases with no data dependency: each phase
  * is deterministic on its own inputs, so interleaving cannot change
  * results, and Spark job submission is thread-safe by design.
  * Note caller-set thread-local properties (job description / job
  * group) do NOT propagate to `a`'s worker thread — its jobs run
  * unlabelled; relevant only if a resident driver cancels by group.
  */
object Par {
  /** If `b` throws, the already-running `a` is still awaited before
    * the exception propagates — never leak a detached running future
    * (its jobs would keep consuming the scheduler and any blocks it
    * checkpoints would never be tracked by a caller). `a`'s own
    * failure surfaces when `b` succeeded; `b`'s exception wins when
    * both fail. */
  def both[A, B](a: => A, b: => B): (A, B) = {
    val fa = Future(a)
    val rb =
      try b
      catch {
        case NonFatal(e) =>
          try Await.result(fa, Duration.Inf)
          catch { case NonFatal(_) => () }
          throw e
      }
    (Await.result(fa, Duration.Inf), rb)
  }
}
