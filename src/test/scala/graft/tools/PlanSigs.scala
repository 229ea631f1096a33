package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join, Window}

/** Shared plan-signature extraction for the registry-wide plan
  * discipline gates (PlanDisciplineSpec) and the whitelist regenerator
  * (PlanWalk). Signatures are structural and deterministic:
  *
  *  - unpartitioned window  → the window's ORDER columns, sorted,
  *    "+"-joined per sort key, ","-joined across keys;
  *  - broadcast join hint   → the hinted side's OUTPUT column names,
  *    sorted and ","-joined.
  *
  * Both read the OPTIMIZED logical plan (pre-AQE, stable at any SF),
  * so a query's signature multiset changes only when its code does.
  * Seam caveat: stages materialized behind localCheckpoint/ExistingRDD
  * seams are separate jobs — their windows/hints are audited by their
  * own per-query PlanSpec gates, not visible here. */
object PlanSigs {

  /** Order-column signatures of every Window with an EMPTY (or
    * constant-folded-away) partitionSpec — the "all rows through one
    * sort task" shape that is only admissible on a provably bounded
    * frame. */
  def unpartitionedWindowSigs(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty =>
        w.orderSpec.map(_.child.references.map(_.name).toSeq.sorted
          .mkString("+")).mkString(",")
    }.sorted

  /** Output-column signatures of every join side carrying an explicit
    * broadcast hint — the round-8 audit surface: a hint FORCES the
    * frame onto every executor regardless of size, so it is only
    * admissible on a provably bounded frame (size-based planning stays
    * free to broadcast anything it measures as small). */
  def broadcastHintSigs(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case j: Join =>
        Seq((j.hint.leftHint, j.left), (j.hint.rightHint, j.right))
          .collect {
            case (Some(h), side) if h.strategy.exists(
                _.toString.toLowerCase.contains("broadcast")) =>
              side.output.map(_.name).sorted.mkString(",")
          }
    }.flatten.sorted
}
