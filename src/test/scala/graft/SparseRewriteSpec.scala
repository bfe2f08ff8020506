package graft

import org.apache.spark.sql.functions._
import graft.operators.SparseKnn

/** [[graft.plans.SparseScanRewriteRule]]: the `ORDER BY sparse_dot(iv,
  * vals, <literal>) DESC LIMIT k` shape over an indexed store becomes
  * the posting-intersection plan — plan-asserted (semi join + pruned
  * postings read), result-pinned against the unrewritten exact scan,
  * kill-switch and idempotence covered. */
class SparseRewriteSpec extends SparkSpec {

  import spark.implicits._

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.SparseScanRewriteRule
    try body finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ eq graft.plans.SparseScanRewriteRule)
    }
  }

  private lazy val store: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sprw").toString
    val sv = SparseKnn.hashingTf(Tables.documents(spark, sfDir), dim = 256)
    SparseKnn.writeIndexedStore(spark, sv, "t_sprw_idx", s"$tmp/store", numBuckets = 4)
    s"$tmp/store"
  }

  // a query literal wide enough that well over k docs share a term
  private val qIdx = (0L until 64L).toSeq
  private val qVal = Seq.fill(64)(1.0)

  private def ranked(k: Int) = {
    graft.GraftFunctions.register(spark)
    spark.read.parquet(store)
      .select(col("doc_id"),
        SparseKnn.sparseDot(col("indices"), col("values"),
          typedlit(qIdx), typedlit(qVal)).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  test("rewrite fires: semi join in the optimized plan, exact same result") { withRule {
    val df = ranked(10)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("LeftSemi"), "expected the candidate semi join in:\n" + opt.take(3000))
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // unrewritten exact scan (kill switch), restricted to positive-dot
    // docs — the rewrite's documented contract: zero-overlap docs are
    // never returned
    spark.conf.set("spark.graft.sparse.rewrite", "false")
    try {
      val exact = ranked(10)
      assert(!exact.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
      val want = exact.where(col("score") > 0).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == want, s"got=$got\nwant=$want")
      assert(got.size == 10, "fixture must have >= 10 overlapping docs")
    } finally spark.conf.set("spark.graft.sparse.rewrite", "true")
  } }

  test("sort key through a projected alias also matches") { withRule {
    graft.GraftFunctions.register(spark)
    spark.read.parquet(store).createOrReplaceTempView("sprw_v")
    val df = spark.sql(
      s"""SELECT doc_id, sparse_dot(indices, values,
         |  array(${qIdx.map(_ + "L").mkString(",")}),
         |  array(${qVal.map(_ + "D").mkString(",")})) AS score
         |FROM sprw_v ORDER BY score DESC, doc_id LIMIT 7""".stripMargin)
    assert(df.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(df.count() == 7)
  } }

  test("idempotence: one semi join only; rewritten plan is stable") { withRule {
    val opt = ranked(5).queryExecution.optimizedPlan
    val joins = opt.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    // the planted semi join + the candidate leg's terms join — a second
    // fixed-point pass must not plant more
    assert(joins.size == 2,
      s"expected exactly the two planted joins, got ${joins.size}:\n$opt")
  } }

  test("single-term query reads pruned postings buckets through the rewrite") { withRule {
    graft.GraftFunctions.register(spark)
    val df = spark.read.parquet(store)
      .select(col("doc_id"),
        SparseKnn.sparseDot(col("indices"), col("values"),
          typedlit(Seq(5L)), typedlit(Seq(1.0))).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(5)
    val plan = df.queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.exists(x => x.group(1).toInt < x.group(2).toInt),
      "expected postings bucket pruning in:\n" + plan.take(3000))
  } }

  test("cosine shape rewrites: column API and SQL lowering, exact vs unrewritten") { withRule {
    graft.GraftFunctions.register(spark)
    def rankedCos(k: Int) = spark.read.parquet(store)
      .select(col("doc_id"),
        SparseKnn.sparseCosine(col("indices"), col("values"),
          typedlit(qIdx), typedlit(qVal)).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    val df = rankedCos(10)
    assert(df.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
      "column-API cosine shape did not rewrite:\n" +
        df.queryExecution.optimizedPlan.toString.take(3000))
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    spark.conf.set("spark.graft.sparse.rewrite", "false")
    try {
      val exact = rankedCos(10)
      assert(!exact.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
      val want = exact.where(col("score") > 0).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == want, s"got=$got\nwant=$want")
    } finally spark.conf.set("spark.graft.sparse.rewrite", "true")
    // the SQL-registered lowering (If(denom=0, null, dot/denom)) matches too
    spark.read.parquet(store).createOrReplaceTempView("sprw_cos_v")
    val sql = spark.sql(
      s"""SELECT doc_id, sparse_cosine_sim(indices, values,
         |  array(${qIdx.map(_ + "L").mkString(",")}),
         |  array(${qVal.map(_ + "D").mkString(",")})) AS score
         |FROM sprw_cos_v ORDER BY score DESC, doc_id LIMIT 7""".stripMargin)
    assert(sql.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
      "SQL cosine shape did not rewrite")
    assert(sql.count() == 7)
  } }

  test("extension-context shapes: With-form denominator and post-ranking projection") { withRule {
    graft.GraftFunctions.register(spark)
    val ranked = spark.read.parquet(store)
      .select(col("doc_id"),
        SparseKnn.sparseCosine(col("indices"), col("values"),
          typedlit(qIdx), typedlit(qVal)).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
    // an extension-injected rule runs BEFORE RewriteWithExpression: the
    // nullif denominator is still a With common-expression there — apply
    // the lowering + the rule by hand to pin that form
    val withForm = org.apache.spark.sql.catalyst.optimizer.ReplaceExpressions(
      ranked.queryExecution.analyzed)
    val rewritten = graft.plans.SparseScanRewriteRule(withForm)
    assert(rewritten.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Join => true
      case _ => false
    }, "With-form cosine denominator did not rewrite")
    // a post-ranking projection (round) slides between limit and sort in
    // the optimized plan — the second match arm catches it
    val projected = ranked.select(col("doc_id"), round(col("score"), 4).as("score"))
    assert(projected.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
      "projection-under-limit shape did not rewrite:\n" +
        projected.queryExecution.optimizedPlan.toString.take(2000))
  } }

  test("non-literal query side does not rewrite") { withRule {
    val sv = spark.read.parquet(store)
    val self = sv.select(col("doc_id"),
        SparseKnn.sparseDot(col("indices"), col("values"),
          col("indices"), col("values")).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(5)
    assert(!self.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
  } }

  private def withStrategy[T](body: => T): T = {
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ graft.plans.SparseIterativeScanStrategy
    try body
    finally spark.experimental.extraStrategies =
      spark.experimental.extraStrategies
        .filterNot(_ eq graft.plans.SparseIterativeScanStrategy)
  }

  test("user filter riding the ORDER BY lowers to the candidate-escalation leaf") {
    withRule { withStrategy {
      // the pre-0.8 hazard: a fixed candidate bound under a selective
      // predicate can return < k survivors. The deterministic adjacent
      // filter lowers to SparseIterativeFilteredScan, which escalates
      // until k survivors or the overlapping corpus is exhausted.
      def filteredQ(k: Int) = spark.read.parquet(store)
        .where(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          SparseKnn.sparseDot(col("indices"), col("values"),
            typedlit(qIdx), typedlit(qVal)).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(k)
      val q = filteredQ(10)
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("SparseIterativeFilteredScan"), opt.take(2000))
      val got = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // the satisfied bounded phase requires k STRICTLY POSITIVE-dot
      // survivors, which dominate every non-candidate row — so the leaf's
      // top-k equals the plain exact filtered scan's top-k, full stop
      val exact = ranked(Int.MaxValue)
        .where(col("doc_id") % 7 === 0)
        .orderBy(col("score").desc, col("doc_id")).limit(10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == exact, s"got=$got exact=$exact")

      // STARVED filter (< k survivors): the exhaustion phase is the PLAIN
      // filtered scan — ALL filtered rows come back, zero-dot included
      val starved = spark.read.parquet(store)
        .where(col("doc_id") % 97 === 0 && col("doc_id") < 400)
        .select(col("doc_id"),
          SparseKnn.sparseDot(col("indices"), col("values"),
            typedlit(qIdx), typedlit(qVal)).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
      assert(starved.queryExecution.optimizedPlan.toString
        .contains("SparseIterativeFilteredScan"))
      val sGot = starved.collect().map(_.getLong(0)).toSet
      val sExact = ranked(Int.MaxValue)
        .where(col("doc_id") % 97 === 0 && col("doc_id") < 400)
        .collect().map(_.getLong(0)).toSet
      assert(sGot == sExact && sGot.size < 10, s"got=$sGot exact=$sExact")
    } }
  }

  test("filtered COSINE shape lowers to the leaf and matches the exact scan") {
    withRule { withStrategy {
      def filteredCos(k: Int) = spark.read.parquet(store)
        .where(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          SparseKnn.sparseCosine(col("indices"), col("values"),
            typedlit(qIdx), typedlit(qVal)).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
      val q = filteredCos(10)
      assert(q.queryExecution.optimizedPlan.toString.contains("SparseIterativeFilteredScan"),
        q.queryExecution.optimizedPlan.toString.take(2000))
      val got = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      spark.conf.set("spark.graft.sparse.rewrite", "false")
      try {
        val exact = filteredCos(10)
        assert(!exact.queryExecution.optimizedPlan.toString
          .contains("SparseIterativeFilteredScan"))
        val want = exact.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        // satisfied bounded phase requires > 0 scores; with ≥ k positive
        // survivors the leaf's top-k equals the exact scan's top-k
        assert(got == want, s"got=$got\nwant=$want")
      } finally spark.conf.set("spark.graft.sparse.rewrite", "true")
      // STARVED cosine filter: the exhaustion phase is the PLAIN filtered
      // scan — exact user semantics, zero-dot rows included
      def starvedCos(k: Int) = spark.read.parquet(store)
        .where(col("doc_id") % 97 === 0 && col("doc_id") < 400)
        .select(col("doc_id"),
          SparseKnn.sparseCosine(col("indices"), col("values"),
            typedlit(qIdx), typedlit(qVal)).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
      val sGot = starvedCos(10).collect().map(_.getLong(0)).toSeq
      spark.conf.set("spark.graft.sparse.rewrite", "false")
      try {
        val sWant = starvedCos(10).collect().map(_.getLong(0)).toSeq
        assert(sGot == sWant, s"got=$sGot want=$sWant")
      } finally spark.conf.set("spark.graft.sparse.rewrite", "true")
    } }
  }

  test("odd filtered shapes stand down to the exact scan") { withRule { withStrategy {
    // an UNPUSHABLE (nondeterministic) filter parks above the Project,
    // not on the relation — neither the semi-join rewrite nor the
    // iterative leaf may fire
    val nondet = spark.read.parquet(store)
      .select(col("doc_id"),
        SparseKnn.sparseDot(col("indices"), col("values"),
          typedlit(qIdx), typedlit(qVal)).as("score"))
      .where(rand(42) < 0.999999) // nondeterministic, not constant-foldable
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
    val opt = nondet.queryExecution.optimizedPlan.toString
    assert(!opt.contains("LeftSemi") && !opt.contains("SparseIterativeFilteredScan"),
      opt.take(2000))
    // kill switch: iterative off + filter present = plain exact scan
    spark.conf.set("spark.graft.sparse.iterative", "false")
    try {
      val q = spark.read.parquet(store)
        .where(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          SparseKnn.sparseDot(col("indices"), col("values"),
            typedlit(qIdx), typedlit(qVal)).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
      val o2 = q.queryExecution.optimizedPlan.toString
      assert(!o2.contains("LeftSemi") && !o2.contains("SparseIterativeFilteredScan"),
        o2.take(2000))
      assert(q.collect().length == 10)
    } finally spark.conf.unset("spark.graft.sparse.iterative")
  } } }
}
