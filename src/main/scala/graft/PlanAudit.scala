package graft

import org.apache.spark.sql.SparkSession

/** Prints plan-health summary per query: filter pushdown, scan column
  * pruning, join strategies, codegen coverage. (§7 step 7 tooling.) */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    // the canonical graft session — extensions included, so the audit
    // sees the plans users (and Verify/Bench) actually get: without
    // them the index-scan rewrite rules never fire and a rewrite query
    // audits as its unrewritten exact scan
    val spark = GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = args.drop(1) match {
      case Array() => Seq("q1_agg", "q3_top_orders", "q5_region_revenue", "q_knn_l2",
        "q_knn_batch", "q_dedup_minhash_lsh", "q_events_sessionize", "q_status_registered",
        "q_e2e_search", "q_embed_md5", "q_bm25", "q_hybrid_rrf", "q_dedup_embedding",
        "q_upsert_store", "q_tfidf_keywords",
        "q_knn_sparse", "q_knn_sparse_idx", "q_dbscan", "q_ann_ivfpq_idx",
        "q_ann_hnsw_sharded",
        // round 10: planner-lowered filtered ANN, routed shards, partsupp
        "q_knn_filtered_sql", "q_knn_sparse_filt", "q_ann_hnsw_routed",
        "q2_min_cost_supp", "q11_important_stock", "q16_parts_supp",
        "q20_potential_promo",
        // round 11: Matryoshka family (prefix coarse, SQL lowering)
        "q_ann_matryoshka", "q_knn_matryoshka_sql",
        // round 20: the crawl-ingest edge (narrow codec stages + the
        // capstone's single dedup shuffle)
        "q_warc_extract", "q_archive_extract", "q_e2e_crawl")
      case rest => rest.toSeq
    }
    for (name <- interesting) {
      val df = Queries.defs(name).run(spark, d)
      // run THIS QueryExecution's physical plan (count()/write() would
      // plan a different query) so AQE finalizes and the plan string
      // carries the `*(N)` codegen-stage ids
      df.queryExecution.executedPlan.execute()
        .foreachPartition((_: Iterator[_]) => ())
      // executed adaptive plans print BOTH "== Final Plan ==" and
      // "== Initial Plan ==" sections — count nodes on the final one only
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(formatted)
        .filterNot(_.contains("[]")).size
      val scans = "ReadSchema: ([^\\n]+)".r.findAllMatchIn(formatted).map(_.group(1)).toSeq
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      // codegen spans = distinct `*(N)` stage ids in the executed plan
      // (FormattedMode in Spark 4 doesn't print "WholeStageCodegen")
      val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
      val exch = "Exchange".r.findAllIn(plan).size
      val wgl = "WindowGroupLimit".r.findAllIn(plan).size
      val topk = "TakeOrderedAndProject".r.findAllIn(plan).size
      println(s"== $name: pushedFilters=$pushed bhj=$bhj smj=$smj bnlj=$bnlj codegenSpans=$wsc exchanges=$exch windowGroupLimit=$wgl takeOrdered=$topk")
      scans.foreach(sc => println(s"   scan: ${sc.take(140)}"))
    }
    spark.stop()
  }
}
