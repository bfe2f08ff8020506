package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Predicate re-binding shared by the iterative-scan EXECUTION paths
  * ([[IvfIterativeScan]], [[SparseIterativeScan]]): the leaf's predicate
  * was resolved against the replaced relation's exprIds, so plans built
  * at execution time re-resolve it BY NAME against their fresh reads —
  * one definition, so a quoting or resolution fix cannot miss a twin. */
private[plans] object PlanRebind {
  def byName(pred: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(pred.transform {
      case a: AttributeReference =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(a.name)
    })
}

/** Helpers shared by the index-scan rewrite rules
  * ([[IvfScanRewriteRule]], [[SparseScanRewriteRule]]) — one definition
  * so a fix to attribute resolution or store discovery cannot silently
  * miss the twin rule. */
private[plans] trait RewriteSupport {

  protected def conf(key: String, default: String): String =
    org.apache.spark.sql.internal.SQLConf.get.getConfString(key, default)

  /** Chase an attribute through Project aliases down the subtree: the
    * optimizer routinely moves the sort key's defining expression into a
    * lower Project (`SELECT vec_l2(...) AS dist ... ORDER BY dist`). */
  protected def resolveThroughProjects(e: Expression, plan: LogicalPlan): Expression = e match {
    case ar: AttributeReference =>
      val defn = plan.collect {
        case p: Project => p.projectList.collectFirst {
          case al: Alias if al.exprId == ar.exprId => al.child
        }
      }.flatten.headOption
      defn.map(resolveThroughProjects(_, plan)).getOrElse(ar)
    case other => other
  }

  /** The UNIQUE parquet relation owning every one of `attrs` — ambiguity
    * (zero or several matching relations) refuses the rewrite. */
  protected def relationOwning(plan: LogicalPlan, attrs: Seq[AttributeReference])
      : Option[(LogicalRelation, HadoopFsRelation)] =
    plan.collect {
      case r @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
          if attrs.forall(a => r.output.exists(_.exprId == a.exprId)) => (r, fs)
    } match {
      case Seq(one) => Some(one)
      case _ => None
    }
}
