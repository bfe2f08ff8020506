package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.{broadcast, col, first, lit, sum}

/** The SPARSE twin of [[IvfIterativeFilteredScan]]: iterative filtered
  * scans for `WHERE pred ORDER BY sparse_dot(iv, vv, lit, lit) [DESC]
  * LIMIT k` over a persisted postings store. A fixed candidate bound
  * (`k·overfetch`) under a selective predicate can return fewer than k
  * survivors — the pre-0.8 contract; this leaf ESCALATES the candidate
  * bound geometrically at execution time until k filtered survivors
  * exist or the candidate set covers every OVERLAPPING document, at
  * which point the result is exact over the filtered overlapping corpus
  * (zero-dot documents are never candidates — the standard sparse
  * retrieval contract the fixed rewrite documents; a query that must
  * keep zero-dot rows spells the condition out, e.g. `AND sparse_dot(…)
  * > 0` in the predicate makes both the exact scan and this plan agree
  * exactly).
  *
  * Planted by [[SparseScanRewriteRule]] in place of `Filter(pred,
  * store-relation)` when exactly one deterministic relation-adjacent
  * filter rides the indexed ORDER BY; anything odder stands down to the
  * exact scan. Opt out with `spark.graft.sparse.iterative=false`. */
case class SparseIterativeFilteredScan(
    output: Seq[Attribute],
    storePath: String,
    postingsTable: String,
    postingsPath: String,
    idCol: String,
    qIdx: Seq[Long],
    qVal: Seq[Double],
    byCosine: Boolean,
    pred: Expression,
    k: Int) extends LeafNode {
  override def producedAttributes: AttributeSet = outputSet ++ pred.references
  override def computeStats(): Statistics = Statistics(sizeInBytes = BigInt(1) << 28)
  override def simpleString(maxFields: Int): String =
    s"SparseIterativeFilteredScan k=$k terms=${qIdx.length} byCosine=$byCosine " +
      s"path=$storePath pred=${pred.sql}"
}

/** Physical operator — TWO-PHASE, not a geometric ladder: unlike the
  * IVF variant (where each round's cost is proportional to the probed
  * partitions, so doubling is the right escalation), the sparse
  * candidate frame costs the same to rank at any bound — the postings
  * scan and top-n sort cover every overlapping document regardless of
  * n. So one bounded round (`k·overfetch` candidates, the fixed
  * rewrite's shape) runs the `take(k)` existence probe, and an
  * unsatisfied filter goes STRAIGHT to exhaustion: the store
  * semi-joined to ALL overlapping ids (no ranking needed — the user's
  * Sort above is the ranking) under the predicate, which is exact over
  * the filtered overlapping corpus. Total work ≤ 2 rounds. */
case class SparseIterativeFilteredScanExec(
    output: Seq[Attribute],
    storePath: String,
    postingsTable: String,
    postingsPath: String,
    idCol: String,
    qIdx: Seq[Long],
    qVal: Seq[Double],
    byCosine: Boolean,
    pred: Expression,
    k: Int) extends LeafExecNode {

  override def producedAttributes: AttributeSet = outputSet ++ pred.references

  protected override def doExecute(): RDD[InternalRow] = {
    val spark = SparkSession.active
    val overfetch = org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.sparse.overfetch", "4").toInt
    val (_, bounded) = SparseIterativeScan.probePlan(spark, storePath, postingsTable,
      postingsPath, idCol, qIdx, qVal, byCosine, pred)(math.max(k, k * overfetch))
    val have = bounded.select(lit(1)).take(k).length
    val finalDf =
      if (have >= k) bounded
      else SparseIterativeScan.exhaustivePlan(spark, storePath, postingsTable,
        postingsPath, idCol, qIdx, pred)
    finalDf.select(output.map(a => col(a.name)): _*).queryExecution.toRdd
  }
}

object SparseIterativeScan {
  /** One round: (candidate id frame bounded at `n`, the store filtered
    * to those candidates AND the user predicate). Package-visible so
    * specs can assert the plan shape (postings-only read on the
    * candidate leg, predicate on the store leg). */
  private[graft] def probePlan(spark: SparkSession, storePath: String,
      postingsTable: String, postingsPath: String, idCol: String,
      qIdx: Seq[Long], qVal: Seq[Double], byCosine: Boolean,
      pred: Expression)(n: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    val postings =
      if (postingsTable.nonEmpty && spark.catalog.tableExists(postingsTable))
        spark.table(postingsTable)
      else spark.read.parquet(postingsPath)
    val qdf = qIdx.zip(qVal).toDF("__qt", "__qw")
    val scored = postings
      .where(col("__t").isin(qIdx: _*))
      .join(qdf, col("__t") === col("__qt"))
      .groupBy(col(idCol))
      .agg(sum(col("__v") * col("__qw")).as("__dot"), first(col("__n")).as("__dn"))
    val ranked =
      if (byCosine) scored.where(col("__dn") > 0)
        .select(col(idCol), (col("__dot") / col("__dn")).as("__r"))
      else scored.select(col(idCol), col("__dot").as("__r"))
    val cand = ranked.orderBy(col("__r").desc, col(idCol)).limit(n).select(col(idCol))
    val predCol = org.apache.spark.sql.graft.ColumnBridge.column(pred.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
    val filtered = spark.read.parquet(storePath)
      .join(broadcast(cand), Seq(idCol), "left_semi")
      .where(predCol)
    (cand, filtered)
  }

  /** The exhaustion phase: every OVERLAPPING document (≥ 1 shared term —
    * a distinct-id projection of the query terms' postings, no ranking)
    * semi-joined to the store under the predicate. The user's Sort/Limit
    * above does the ranking; exact over the filtered overlapping corpus. */
  private[graft] def exhaustivePlan(spark: SparkSession, storePath: String,
      postingsTable: String, postingsPath: String, idCol: String,
      qIdx: Seq[Long], pred: Expression): DataFrame = {
    val postings =
      if (postingsTable.nonEmpty && spark.catalog.tableExists(postingsTable))
        spark.table(postingsTable)
      else spark.read.parquet(postingsPath)
    val overlapping = postings
      .where(col("__t").isin(qIdx: _*))
      .select(col(idCol)).distinct()
    val predCol = org.apache.spark.sql.graft.ColumnBridge.column(pred.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
    spark.read.parquet(storePath)
      .join(overlapping, Seq(idCol), "left_semi")
      .where(predCol)
  }
}

/** Plans [[SparseIterativeFilteredScan]] — registered beside
  * [[IvfIterativeScanStrategy]]. */
object SparseIterativeScanStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case s: SparseIterativeFilteredScan =>
      SparseIterativeFilteredScanExec(s.output, s.storePath, s.postingsTable,
        s.postingsPath, s.idCol, s.qIdx, s.qVal, s.byCosine, s.pred, s.k) :: Nil
    case _ => Nil
  }
}
