package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._

/** Audit machinery for the repo's GLOBAL-WINDOW discipline.
  *
  * The codebase deliberately runs ~78 unpartitioned window sites
  * (`Window.orderBy(...)` / `Window.partitionBy(lit(1))`): ECDF
  * spines, day grids, vocabulary frames, risk-table spines. A window
  * with no partition key executes as ONE task over its whole input,
  * so the design invariant is that every such site's input frame is
  * SUPPORT-BOUNDED — its row count grows with the value support
  * (days, distinct scores, vocab), not the corpus. Nothing in Spark
  * enforces that; a future site could silently put a corpus-grain
  * frame through a single-partition sort. This object gives the test
  * suite a way to FIND every global-window input in an analyzed plan
  * so PlanSpec can measure its growth across scale factors and fail
  * on an undeclared corpus-grain site (VERDICT r14 #3).
  */
object WindowAudit {

  /** True when a window partition spec provides no real partitioning:
    * empty, or all-literal (`partitionBy(lit(1))` — the repo's
    * explicit "one partition on purpose" idiom).
    */
  def isGlobalSpec(partitionSpec: Seq[Expression]): Boolean =
    partitionSpec.forall {
      case _: Literal => true
      case _          => false
    }

  /** The input subtrees of every unpartitioned Window node in `plan`,
    * deduplicated by canonicalized form (thirty queries sharing one
    * day-spine builder audit that spine once).
    */
  def globalWindowInputs(plan: LogicalPlan): Seq[LogicalPlan] = {
    val found = scala.collection.mutable.ArrayBuffer[LogicalPlan]()
    plan.foreach {
      case w: Window if isGlobalSpec(w.partitionSpec) => found += w.child
      case _                                          => ()
    }
    found.toSeq.distinctBy(_.canonicalized)
  }

  /** Structural lower gate: a global window input whose every path to
    * a corpus leaf crosses a row-grain collapse (Aggregate /
    * Deduplicate / a global limit) or bottoms out in a bounded leaf
    * (Range / LocalRelation / OneRowRelation) is at least GROUP
    * grain, never raw-row grain. This does not prove support-
    * boundedness (a groupBy(doc_id) passes), so PlanSpec pairs it
    * with the measured growth-ratio check; what it catches cheaply is
    * the worst class — a window directly over corpus rows.
    */
  def collapsesRowGrain(plan: LogicalPlan): Boolean = plan match {
    case _: Aggregate | _: Deduplicate | _: GlobalLimit | _: LocalLimit =>
      true
    case _: Range | _: LocalRelation | _: OneRowRelation => true
    case l: LeafNode                                     => false
    case p => p.children.forall(collapsesRowGrain)
  }
}
