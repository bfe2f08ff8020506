package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("boilerplateNgrams finds exactly the cross-document repeated bigrams") {
    // "shared header" appears in 3/5 docs (df rate 0.6); everything else
    // is unique per doc
    val docs = Seq(
      (1L, "shared header alpha beta"),
      (2L, "shared header gamma delta"),
      (3L, "shared header epsilon zeta"),
      (4L, "eta theta iota kappa"),
      (5L, "lambda mu nu xi")).toDF("doc_id", "text")
    val bp = Curation.boilerplateNgrams(docs, minDfFrac = 0.5).collect()
    assert(bp.map(_.getString(0)).toSet == Set("shared header"))
    assert(bp.head.getLong(1) == 3L)
  }

  test("boilerplateRatio is hits/total and filterBoilerplate drops heavy docs") {
    val docs = Seq(
      (1L, "spam spam spam spam"),       // bigram "spam spam" in 3 docs
      (2L, "spam spam fresh words"),
      (3L, "spam spam other tokens"),
      (4L, "clean unique text here")).toDF("doc_id", "text")
    val ratios = Curation.boilerplateRatio(docs, minDfFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // doc 1: bigrams (distinct) = {"spam spam"} → ratio 1.0
    assert(ratios(1L) == 1.0)
    assert(ratios(4L) == 0.0)
    val kept = Curation.filterBoilerplate(docs, maxRatio = 0.5, minDfFrac = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(4L) && !kept.contains(1L))
    assert(kept == ratios.filter(_._2 <= 0.5).keySet)
  }

  test("capPerGroup keeps the quota lowest-ordered rows per group") {
    val df = (1L to 100L).map(i => (s"g${i % 3}", i)).toDF("grp", "id")
    val capped = Curation.capPerGroup(df, "grp", "id", quota = 5)
    val byGroup = capped.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byGroup.values.forall(_.size == 5))
    // per group, exactly the 5 smallest ids survive
    val expect = (1L to 100L).groupBy(i => s"g${i % 3}")
      .view.mapValues(_.sorted.take(5).toSeq).toMap
    assert(byGroup == expect)
  }

  test("capPerGroup plans to WindowGroupLimit (pre-shuffle bounded heaps)") {
    val df = Tables.documents(spark, sfDir)
    val plan = Curation.capPerGroup(df, "source", "doc_id", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("runPipeline manifest chains counts and matches the final corpus") {
    val docs = Tables.documents(spark, sfDir)
    val stages = Seq(
      Curation.Stage("lang_en", df => df.where(col("lang") === "en")),
      Curation.Stage("cap", df => Curation.capPerGroup(df, "source", "doc_id", 5)))
    val (out, manifest) = Curation.runPipeline(docs, stages)
    val m = manifest.orderBy("stage_idx").collect()
    assert(m.map(_.getString(1)).toSeq == Seq("lang_en", "cap"))
    assert(m.head.getLong(2) == docs.count())          // rows_in of stage 0
    assert(m(1).getLong(2) == m.head.getLong(3))       // chained boundaries
    assert(out.count() == m(1).getLong(3))             // final == last rows_out
    assert(m.forall(r => r.getLong(3) <= r.getLong(2))) // filters only shrink
  }

  test("deterministicShuffle is stable under repartitioning and salt-distinct") {
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    def order(df: org.apache.spark.sql.DataFrame, salt: String): Seq[Long] =
      Curation.deterministicShuffle(df, "doc_id", salt)
        .select("doc_id").as[Long].collect().toSeq
    val a = order(docs, "epoch0")
    val b = order(docs.repartition(13), "epoch0")
    assert(a == b)                       // partitioning-independent
    val c = order(docs, "epoch1")
    assert(a != c)                       // a new salt is a new permutation
    assert(a.sorted == c.sorted)         // ... of the same rows
  }

  test("exactQuantileBounded matches Spark's exact percentile on a bounded domain") {
    // discrete scores with uneven masses, n even AND odd, interior and
    // edge quantiles — the interpolation cases percentile_cont hits
    val vals = Seq(0.0, 0.0, 0.3, 0.3, 0.3, 0.4, 0.7, 0.7, 1.0)
    for (take <- Seq(vals.length, vals.length - 1); p <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val df = vals.take(take).toDF("v")
      val got = Curation.exactQuantileBounded(df, "v", p)
      val want = df.agg(expr(s"percentile(v, $p)")).collect().head.getDouble(0)
      assert(math.abs(got - want) < 1e-12, s"take=$take p=$p got=$got want=$want")
    }
    // the corpus pass is a histogram with map-side partial aggregation,
    // never a single-buffer exact percentile
    val plan = vals.toDF("v").groupBy(col("v")).count()
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && plan.contains("partial_count"), plan.take(800))
  }

  test("exactQuantileBounded fails fast on an unbounded (continuous) domain") {
    // 1000 distinct values against maxDomain=100: the broken-contract
    // case must raise with actionable guidance, not collect the full
    // histogram onto the driver
    val df = spark.range(1000).select((col("id") / 7.0).as("v"))
    val e = intercept[IllegalArgumentException](
      Curation.exactQuantileBounded(df, "v", 0.5, maxDomain = 100))
    assert(e.getMessage.contains("distinct values"))
    assert(e.getMessage.contains("approx_percentile"))
    // same frame succeeds when the cap admits the domain
    val ok = Curation.exactQuantileBounded(df, "v", 0.0, maxDomain = 1000)
    assert(ok == 0.0)
  }
}
