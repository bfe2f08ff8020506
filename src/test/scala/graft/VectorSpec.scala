package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.Knn

class VectorSpec extends SparkSpec {

  private def one(vecA: Seq[Double], vecB: Seq[Double], f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Double = {
    import spark.implicits._
    Seq((vecA, vecB)).toDF("a", "b").select(f(col("a"), col("b")).as("v"))
      .head().getDouble(0)
  }

  test("l2 / cosine / inner product agree with hand math") {
    val a = Seq(1.0, 0.0, 0.0); val b = Seq(0.0, 1.0, 0.0)
    assert(math.abs(one(a, b, l2Distance) - math.sqrt(2)) < 1e-12)
    assert(math.abs(one(a, b, cosineDistance) - 1.0) < 1e-12)
    assert(math.abs(one(a, b, innerProduct) - 0.0) < 1e-12)
    assert(math.abs(one(a, a, cosineDistance) - 0.0) < 1e-12)
    assert(math.abs(one(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0), innerProduct) - 32.0) < 1e-12)
  }

  test("zero vectors get cosine similarity 0 (not NaN), so they never outrank real neighbors") {
    val z = Seq(0.0, 0.0, 0.0); val v = Seq(1.0, 2.0, 3.0)
    assert(one(z, v, cosineSimilarity) == 0.0)
    assert(one(z, z, cosineSimilarity) == 0.0)
    assert(one(v, z, cosineDistance) == 1.0)
  }

  test("mismatched dimensions throw (pgvector semantics), not silently truncate") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(innerProduct(col("a"), col("b"))).collect()
    }
    def root(t: Throwable): Throwable = if (t.getCause == null) t else root(t.getCause)
    assert(root(e).getMessage.contains("dimensions differ"), e.getMessage)
  }

  test("knn self-query returns itself first at distance 0") {
    val e = Tables.embeddings(spark, sfDir)
    val top = Knn.topK(e, e.where(col("vec_id") === 7), Knn.L2, 3).collect()
    assert(top.head.getLong(0) == 7L)
    assert(top.head.getDouble(1) == 0.0)
    assert(top.map(_.getDouble(1)).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("knn top-k plan uses TakeOrderedAndProject (no global sort)") {
    val e = Tables.embeddings(spark, sfDir)
    val plan = Knn.topK(e, e.where(col("vec_id") === 0), Knn.L2, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("e2e search plans shuffle-free: narrow scan + broadcast + TakeOrdered") {
    val df = Queries.defs("q_e2e_search").run(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    // broadcast exchanges are fine; any hash/range repartition would mean
    // the row-local featurizer regressed to a shuffling formulation
    assert(!plan.contains("Exchange hashpartitioning") &&
           !plan.contains("Exchange rangepartitioning"), plan.take(3000))
  }

  test("md5-embed votes: matches the SQL explode+groupBy formulation exactly") {
    import graft.functions.EmbedExpressions
    import spark.implicits._
    val df = Seq((1L, "alpha beta alpha gamma"), (2L, ""), (3L, "x")).toDF("id", "t")
    // sparse expression output, exploded to (id, bucket, v)
    val viaExpr = df.select(col("id"),
        posexplode(EmbedExpressions.md5EmbedVotes(col("t"), 16)).as(Seq("b", "v")))
      .where(col("v").isNotNull)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    // reference formulation: explode tokens, conv(md5), groupBy
    val viaSql = df.select(col("id"), explode(split(col("t"), " ")).as("tok"))
      .select(col("id"), expr("cast(conv(substr(md5(tok), 1, 8), 16, 10) as bigint)").as("h"))
      .select(col("id"), (col("h") % 16).cast("int").as("b"),
        when((expr("h div 16") % 2) === 0, 1.0).otherwise(-1.0).as("s"))
      .groupBy("id", "b").agg(sum("s").as("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(viaExpr == viaSql)
    // dense form zero-fills instead of nulling, same touched values
    val dense = df.select(col("id"),
        posexplode(EmbedExpressions.md5EmbedVotes(col("t"), 16, dense = true)).as(Seq("b", "v")))
      .where(col("v") =!= 0.0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(dense == viaExpr.filter(_._3 != 0.0))
  }

  test("codegen and interpreted kernel paths agree (two impls, one truth)") {
    val e = Tables.embeddings(spark, sfDir)
    def run(): Array[(Long, Double)] =
      Knn.topK(e, e.where(col("vec_id") === 3), Knn.Cosine, 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(withCodegen.toSeq == interpreted.toSeq)
  }

  test("batch knn returns k rows per query, rank 1 is the query itself") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where(col("vec_id") < 4).select(col("vec_id").as("qid"), col("embedding"))
    val res = Knn.topKBatch(e, q, Knn.L2, 3).collect()
    assert(res.length == 12)
    val firsts = res.filter(_.getLong(3) == 1L)
    assert(firsts.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("vec_sum / vec_avg aggregates: hand math, partitioning invariance, edge cases") {
    import spark.implicits._
    import graft.functions.VectorAggregates._
    val df = Seq(
      (0L, Seq(1.0f, 2.0f, 3.0f)),
      (0L, Seq(0.5f, -2.0f, 1.25f)),
      (0L, Seq(0.0f, 1.0f, -0.25f)),
      (1L, Seq(10.0f, 20.0f, 30.0f))
    ).toDF("g", "v")
    val sums = df.groupBy("g").agg(vecSum(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(sums(0L) == Seq(1.5, 1.0, 4.0))
    assert(sums(1L) == Seq(10.0, 20.0, 30.0))
    val avgs = df.groupBy("g").agg(vecAvg(col("v")).as("a"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(avgs(0L).zip(Seq(0.5, 1.0 / 3, 4.0 / 3))
      .forall { case (a, b) => math.abs(a - b) < 1e-9 }, avgs(0L).toString)
    assert(avgs(1L) == Seq(10.0, 20.0, 30.0))
    // exact integer accumulation: result identical at any partitioning
    val p1 = df.repartition(1).groupBy("g").agg(vecSum(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val p7 = df.repartition(7).groupBy("g").agg(vecSum(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p1 == p7 && p1 == sums)
    // nulls are skipped like every SQL aggregate
    val withNull = df.union(Seq((0L, null.asInstanceOf[Seq[Float]])).toDF("g", "v"))
    val s2 = withNull.groupBy("g").agg(vecSum(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(s2 == sums)
    // avg == sum / count inside the aggregate (the identity the oracle
    // relies on for the sum gate covering both)
    val both = df.groupBy("g").agg(vecSum(col("v")).as("s"), vecAvg(col("v")).as("a"),
        count(lit(1)).as("n")).collect()
    both.foreach { r =>
      val s = r.getSeq[Double](1); val a = r.getSeq[Double](2); val n = r.getLong(3)
      s.zip(a).foreach { case (sv, av) => assert(math.abs(sv / n - av) < 1e-9) }
    }
    // mixed dimensions in one group fail loud, not silently truncate
    val mixed = Seq((0L, Seq(1.0f, 2.0f)), (0L, Seq(1.0f, 2.0f, 3.0f))).toDF("g", "v")
    val e = intercept[Exception] {
      mixed.repartition(1).groupBy("g").agg(vecSum(col("v")).as("s")).collect()
    }
    assert(e.getMessage != null)
  }

  test("l1 distance (pgvector <+>): hand math, kernel paths agree, SQL surface") {
    import spark.implicits._
    assert(math.abs(one(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), l1Distance) - 2.0) < 1e-12)
    assert(math.abs(one(Seq(1.0, -2.0, 3.0), Seq(4.0, 5.0, -6.0), l1Distance) - 19.0) < 1e-12)
    assert(math.abs(one(Seq(1.0, 2.0), Seq(1.0, 2.0), l1Distance)) < 1e-12)
    // mismatched dims throw like every kernel
    val bad = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(l1Distance(col("a"), col("b"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("dimensions differ")), msgs(e).toString)
    // SQL registration matches the column API
    GraftFunctions.register(spark)
    val viaSql = Seq((Seq(1.0, -2.0, 3.0), Seq(4.0, 5.0, -6.0))).toDF("a", "b")
      .selectExpr("vec_l1(a, b)").head().getDouble(0)
    assert(math.abs(viaSql - 19.0) < 1e-12)
  }

}
