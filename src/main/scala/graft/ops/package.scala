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
}
