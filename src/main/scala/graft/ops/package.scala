package graft

import org.apache.spark.sql.Dataset

package object ops {

  /** Lineage-truncation switch for the iterative operator family.
    *
    * Production behavior (flag unset) is an eager `localCheckpoint`
    * per round — constant-size plans no matter how many rounds, one
    * materialization per checkpoint. Under `-Dgraft.noCkpt=1` (or env
    * `SPARK_GRAFT_NO_CKPT=1`) [[CkptOps.ckpt]] is the identity, so the
    * full unrolled lineage stays visible to plan inspection:
    * PlanAuditSpec runs its gates (cartesian / nested-loop / window /
    * multi-scan / value-buffer / bounded-bucket self-join /
    * fact-broadcast) against these checkpoint-free variants, closing
    * the LogicalRDD blind spot where a checkpointed loop body could
    * hide a scale defect from the machine audit.
    */
  object CkptFlag {
    def disabled: Boolean =
      sys.props.get("graft.noCkpt").contains("1") ||
        sys.env.get("SPARK_GRAFT_NO_CKPT").contains("1")
  }

  /** `ds.ckpt()` = eager `localCheckpoint` unless [[CkptFlag.disabled]].
    * Every iterative loop in the ops package truncates lineage through
    * this call so the audit flag reaches all of them at once. */
  implicit class CkptOps[T](private val ds: Dataset[T]) extends AnyVal {
    def ckpt(eager: Boolean = true): Dataset[T] =
      if (CkptFlag.disabled) ds else ds.localCheckpoint(eager)
  }

  /** Run independent eager-materialization branches concurrently.
    *
    * Builders that checkpoint several INDEPENDENT relations (the three
    * walks of a beam sweep, the five strategies of a serving-cost
    * table) used to submit those jobs sequentially, so every job's
    * straggler tail left the executors idle (optimization guide §2.6:
    * actions are only sequential because driver code calls them
    * sequentially). Submitting them from concurrent driver threads
    * lets Spark's FIFO scheduler back-fill freed cores with the next
    * branch's tasks. Results are identical — each branch is the same
    * deterministic plan, only the submission overlaps.
    *
    * Under [[CkptFlag.disabled]] construction is pure plan building
    * (no jobs), so branches run sequentially and the audit variant
    * sees exactly the original single-threaded construction. */
  def inParallel[A](thunks: (() => A)*): Seq[A] =
    if (CkptFlag.disabled || thunks.lengthCompare(1) <= 0) thunks.map(_())
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      Await.result(Future.sequence(thunks.map(t => Future(t()))), Duration.Inf)
    }
}
