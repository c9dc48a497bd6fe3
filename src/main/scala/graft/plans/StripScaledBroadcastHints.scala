package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer safety net for forced broadcasts — the engine-side
  * enforcement of the discipline the spec suite locks statically (the
  * OperatorSpec suite-wide hint sweep): a user's `broadcast()` hint on
  * a frame whose estimated size exceeds
  * `spark.graft.broadcastHint.maxBytes` is STRIPPED, letting the
  * planner (and AQE at runtime) choose the join strategy from real
  * sizes instead of obeying a hint written at a smaller scale.
  *
  * Why a Rule and not just review discipline: hints are scale
  * assertions frozen into code. A pipeline hinted at SF 1 OOMs its
  * driver/executors at SF 1000, because `broadcast()` overrides the
  * size-based planner unconditionally — the exact failure class the
  * r7/r8 reviews kept finding by hand (customer, then supplier/part).
  * With this rule the hint degrades from a command to a bounded
  * suggestion: honored while the estimate fits, ignored once it
  * cannot possibly be safe.
  *
  * Semantics:
  *  - Only the BROADCAST strategy is affected; other hint state
  *    (e.g. shuffle-merge hints) passes through untouched.
  *  - The bound reads from logical statistics (`plan.stats`), the
  *    same estimate `autoBroadcastJoinThreshold` consults; with CBO
  *    off this is the conservative size-in-bytes visitor.
  *  - `spark.graft.broadcastHint.maxBytes = -1` disables the rule.
  *    Default 512 MiB: far above every sanctioned hint (25-row dims,
  *    literal-capacity sets), far below what a 1000-executor
  *    cluster's driver survives collecting.
  *  - Idempotent (a stripped hint stays stripped), and a no-op on
  *    hint-free plans — safe as an always-on extension rule.
  */
class StripScaledBroadcastHints(spark: SparkSession) extends Rule[LogicalPlan] {

  private def maxBytes: Long =
    spark.conf.get("spark.graft.broadcastHint.maxBytes", (512L << 20).toString).toLong

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val limit = maxBytes
    if (limit < 0) plan
    else plan.transformUp {
      case j: Join if j.hint != JoinHint.NONE =>
        def scrub(h: Option[HintInfo], side: LogicalPlan): Option[HintInfo] = h match {
          case Some(hi) if hi.strategy.contains(BROADCAST) &&
              side.stats.sizeInBytes > limit =>
            logWarning(s"stripping broadcast hint: estimated side size " +
              s"${side.stats.sizeInBytes} exceeds spark.graft.broadcastHint.maxBytes=$limit")
            val stripped = hi.copy(strategy = None)
            if (stripped == HintInfo()) None else Some(stripped)
          case other => other
        }
        val nh = JoinHint(scrub(j.hint.leftHint, j.left), scrub(j.hint.rightHint, j.right))
        if (nh == j.hint) j else j.copy(hint = nh)
    }
  }
}
