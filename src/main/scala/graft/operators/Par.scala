package graft.operators

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration.Duration

/** Overlap two INDEPENDENT eager driver phases (artifact
  * checkpoints, model trainings) as concurrent Spark jobs — the
  * scheduler back-fills the tail of one job with the other's tasks,
  * so the two phases' driver-sync latencies overlap instead of
  * summing. Use ONLY for phases with no data dependency: each phase
  * is deterministic on its own inputs, so interleaving cannot change
  * results, and Spark job submission is thread-safe by design
  * (job descriptions/groups are thread-local).
  */
object Par {
  def both[A, B](a: => A, b: => B): (A, B) = {
    val fa = Future(a)
    val rb = b
    (Await.result(fa, Duration.Inf), rb)
  }
}
