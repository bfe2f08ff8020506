package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}
import graft.functions.VectorFunctions

/** IVF (inverted-file) ANN — the second scale path beside [[AnnLsh]]:
  * a coarse k-means quantizer assigns every vector to its nearest
  * centroid cell; queries probe only the `nprobe` nearest cells and
  * rerank exactly.
  *
  * Training is deterministic Lloyd's: init = the k lowest-id vectors,
  * fixed iteration count; each iteration is ONE groupBy over the corpus
  * (posexplode to (cell, dim) partial means — k×dim rows collected to the
  * driver, which is tiny). Assignment is a native expression (embedded
  * centroid matrix, argmin-L2 single pass). At 100 TB the corpus is
  * scanned once per iteration and once for final assignment; nothing
  * else moves.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  /** Nearest-centroid id (argmin L2). Whole-stage-codegen'd (runs once per
    * corpus row); throws on a vector/centroid dimension mismatch rather
    * than silently truncating to the shorter side (which would assign
    * cells on a prefix of the vector — plausible-but-wrong probing). */
  case class NearestCentroidExpr(child: Expression, centroids: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "ivf_cell"

    private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    private def dim: Int = centroids.headOption.map(_.length).getOrElse(0)

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      if (n != dim) throw new IllegalArgumentException(
        s"$prettyName: vector dimension $n != centroid dimension $dim")
      var best = -1; var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val ctr = centroids(c)
        var d = 0.0; var i = 0
        while (i < n) {
          val x = (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)) - ctr(i)
          d += x * x; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val cs = ctx.addReferenceObj("centroids", centroids, "double[][]")
        val n = ctx.freshName("n"); val c = ctx.freshName("c"); val i = ctx.freshName("i")
        val d = ctx.freshName("d"); val x = ctx.freshName("x")
        val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
        val ctr = ctx.freshName("ctr")
        val getElem = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
        s"""
           |int $n = $v.numElements();
           |if ($n != $dim) {
           |  throw new IllegalArgumentException(
           |    "$prettyName: vector dimension " + $n + " != centroid dimension " + $dim);
           |}
           |int $best = -1; double $bestD = Double.MAX_VALUE;
           |for (int $c = 0; $c < $cs.length; $c++) {
           |  double[] $ctr = $cs[$c];
           |  double $d = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $x = $getElem - $ctr[$i];
           |    $d += $x * $x;
           |  }
           |  if ($d < $bestD) { $bestD = $d; $best = $c; }
           |}
           |${ev.value} = $best;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** The `nprobe` nearest centroid ids, nearest first (ties → lower id).
    * Codegen'd like [[NearestCentroidExpr]]; same strict dim check. */
  case class NearestCentroidsExpr(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "ivf_cells"

    private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    private def dim: Int = centroids.headOption.map(_.length).getOrElse(0)

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      if (n != dim) throw new IllegalArgumentException(
        s"$prettyName: vector dimension $n != centroid dimension $dim")
      val dists = new Array[(Double, Int)](centroids.length)
      var c = 0
      while (c < centroids.length) {
        val ctr = centroids(c)
        var d = 0.0; var i = 0
        while (i < n) {
          val x = (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)) - ctr(i)
          d += x * x; i += 1
        }
        dists(c) = (d, c); c += 1
      }
      val top = dists.sortBy(t => (t._1, t._2)).take(math.min(nprobe, centroids.length))
      new GenericArrayData(top.map(_._2.asInstanceOf[Any]))
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val cs = ctx.addReferenceObj("centroids", centroids, "double[][]")
        val n = ctx.freshName("n"); val c = ctx.freshName("c"); val i = ctx.freshName("i")
        val d = ctx.freshName("d"); val x = ctx.freshName("x")
        val ds = ctx.freshName("ds"); val used = ctx.freshName("used")
        val out = ctx.freshName("out"); val m = ctx.freshName("m")
        val j = ctx.freshName("j"); val best = ctx.freshName("best")
        val bestD = ctx.freshName("bestD"); val ctr = ctx.freshName("ctr")
        val getElem = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
        s"""
           |int $n = $v.numElements();
           |if ($n != $dim) {
           |  throw new IllegalArgumentException(
           |    "$prettyName: vector dimension " + $n + " != centroid dimension " + $dim);
           |}
           |double[] $ds = new double[$cs.length];
           |for (int $c = 0; $c < $cs.length; $c++) {
           |  double[] $ctr = $cs[$c];
           |  double $d = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $x = $getElem - $ctr[$i];
           |    $d += $x * $x;
           |  }
           |  $ds[$c] = $d;
           |}
           |int $m = java.lang.Math.min($nprobe, $cs.length);
           |int[] $out = new int[$m];
           |boolean[] $used = new boolean[$cs.length];
           |for (int $j = 0; $j < $m; $j++) {
           |  int $best = -1; double $bestD = Double.MAX_VALUE;
           |  for (int $c = 0; $c < $cs.length; $c++) {
           |    if (!$used[$c] && ($best == -1 || $ds[$c] < $bestD)) { $bestD = $ds[$c]; $best = $c; }
           |  }
           |  $used[$best] = true;
           |  $out[$j] = $best;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def cellOf(emb: Column, model: Model): Column =
    ColumnBridge.column(NearestCentroidExpr(ColumnBridge.expression(emb), model.centroids))

  def cellsOf(emb: Column, model: Model, nprobe: Int): Column =
    ColumnBridge.column(NearestCentroidsExpr(ColumnBridge.expression(emb), model.centroids, nprobe))

  /** Deterministic Lloyd's over a deterministic SAMPLE of the corpus —
    * the standard IVF recipe: the coarse quantizer only needs the density
    * shape, so training reads `samplePercent`% of rows (md5-bucketed,
    * reproducible on any engine/partitioning) and each iteration's
    * posexplode shuffle is over the sample, not the corpus. At 100 TB
    * with the default 10%, that is a 10× cut on every training pass; the
    * full corpus is only scanned once, at assignment time.
    *
    * Init is hash-spread: the k lowest md5(id) rows — an
    * order-independent pseudo-random draw (k-lowest-ID picks adjacent,
    * likely-correlated rows; a spread draw balances cells, which is what
    * probe pruning lives on). Driver holds k×dim doubles — trivial. */
  def train(corpus: DataFrame, k: Int, iters: Int = 5,
            idCol: String = "vec_id", embCol: String = "embedding",
            samplePercent: Int = 10): Model = {
    def init(df: DataFrame): Array[Array[Double]] = df
      .orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(k)
      .select(col(embCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    var sample =
      if (samplePercent >= 100) corpus
      else Sampling.deterministicSample(corpus, idCol, samplePercent, salt = "ivf-train")
    var centroids = init(sample)
    // degenerate corpora (< k sampled rows): fall back to full data —
    // detected from the init collect itself, no extra counting job
    if (centroids.length < k && (sample ne corpus)) {
      sample = corpus
      centroids = init(corpus)
    }
    var it = 0
    while (it < iters) {
      val model = Model(centroids)
      val means = sample
        .select(cellOf(col(embCol), model).as("cell"),
          posexplode(col(embCol).cast("array<double>")).as(Seq("dim", "v")))
        .groupBy(col("cell"), col("dim")).agg(avg(col("v")).as("m"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      centroids = next
      it += 1
    }
    Model(centroids)
  }

  /** Persist an IVF index: corpus assigned to cells, written as parquet
    * partitioned BY CELL — a probed search then reads only the nprobe/k
    * fraction of the data via partition pruning (the on-disk analogue of
    * an inverted file). Centroids ride along as a tiny JSON sidecar,
    * written through the Hadoop filesystem layer so hdfs://s3a://abfss
    * index paths work the same as local ones. */
  def writeIndex(corpus: DataFrame, model: Model, path: String,
                 idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    corpus.select(col(idCol), col(embCol), cellOf(col(embCol), model).as("cell"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    val json = model.centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    writeSidecar(corpus.sparkSession, path, "_centroids.json", json)
  }

  /** Append new vectors to a persisted index: assign each to its cell
    * under the EXISTING centroids (read from the sidecar) and append the
    * rows into the matching `cell=` partitions. Append-only — the caller
    * dedups ids (same contract as [[DedupIndex.appendIndex]]); searches
    * see the new vectors immediately. Centroids are NOT retrained, so a
    * drifting distribution slowly unbalances cells — rebuild with
    * [[writeIndex]] on the usual IVF maintenance cadence. */
  def appendIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                  vectors: DataFrame,
                  idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    recoverPending(spark, path, "appendIndex")
    val model = readModel(spark, path)
    vectors.select(col(idCol), col(embCol), cellOf(col(embCol), model).as("cell"))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(path)
  }

  /** Cell-occupancy stats of a persisted index: `(cell, n, frac)`. The
    * scan reads only the partition column (row counts from parquet
    * metadata) — cheap enough to run on every maintenance tick. */
  def cellStats(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val counts = spark.read.parquet(path).groupBy(col("cell")).count()
    val total = counts.agg(sum(col("count")).as("__tot"))
    counts.crossJoin(broadcast(total))
      .select(col("cell"), col("count").as("n"),
        round(col("count") / col("__tot"), 6).as("frac"))
  }

  /** Per-cell FILE stats of a persisted index: `(cell, files, bytes)`,
    * from one recursive filesystem listing (no data read — same cost
    * class as [[cellStats]], runnable on every maintenance tick). Every
    * [[appendIndex]]/[[appendIndexQuantized]]/[[appendIndexPq]] batch
    * adds at least one file per touched cell dir, so after N streaming
    * batches a cell holds O(N) files — and at 100 TB the file LISTING,
    * not the bytes, is what kills scheduling. This is the trigger side;
    * [[compactIndex]] is the fix. */
  def fileStats(spark: org.apache.spark.sql.SparkSession,
                path: String): Seq[(Int, Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val acc = scala.collection.mutable.Map.empty[Int, (Long, Long)]
    val it = fs.listFiles(p, true)
    val cellRe = """cell=(\d+)""".r
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        cellRe.findFirstMatchIn(f.getPath.toString).foreach { m =>
          val cell = m.group(1).toInt
          val (c, b) = acc.getOrElse(cell, (0L, 0L))
          acc(cell) = (c + 1, b + f.getLen)
        }
      }
    }
    acc.toSeq.map { case (cell, (c, b)) => (cell, c, b) }.sortBy(_._1)
  }

  /** Compaction trigger: true when any cell dir holds more than
    * `maxFilesPerCell` data files. Pure listing, driver sees k rows. */
  def needsCompaction(spark: org.apache.spark.sql.SparkSession, path: String,
                      maxFilesPerCell: Int = 16): Boolean = {
    require(maxFilesPerCell >= 1,
      s"needsCompaction: maxFilesPerCell must be >= 1, got $maxFilesPerCell")
    fileStats(spark, path).exists(_._2 > maxFilesPerCell)
  }

  /** Rewrite an append-sprayed index store to ~targetBytes files per
    * cell, preserving the cell partitioning (searches keep their static
    * `cell IN` file pruning) and every sidecar the store carries
    * (`_centroids.json`, and `_quantize.json` / `_pq.json` /
    * `_metric.json` where present — works unchanged for flat, SQ8, PQ,
    * and cosine stores). Search results are byte-identical before and
    * after (spec-pinned): compaction moves rows between files, never
    * changes them. Run when [[needsCompaction]] fires — typically after
    * N streaming [[appendIndex]]-family batches. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                   targetBytes: Long = 128L * 1024 * 1024): graft.sources.Compaction.Report = {
    // maintenance-op contract: compacting a mid-swap store would read
    // cells whose staged content is not yet installed AND leave the
    // manifest to later install pre-compaction partitions over the
    // compacted layout — roll the swap forward first, like every
    // other op the read gate's error message names
    recoverPending(spark, path, "compactIndex")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // enumerate the store's actual `_*.json` sidecars instead of a
    // hard-coded name list: the fixed list had already gone stale once
    // (it lacked _binary.json, so compacting a binary store silently
    // dropped its marker and broke subsequent searches) and every new
    // index family would have to remember to extend it
    val sidecars = fs.listStatus(p).map(_.getPath.getName)
      .filter(n => n.startsWith("_") && n.endsWith(".json")).toSeq.sorted
    graft.sources.Compaction.compact(spark, path, targetBytes,
      partitionBy = Seq("cell"), preserveFiles = sidecars)
  }

  /** Rebuild heuristic for [[appendIndex]]-grown indexes: true when the
    * hottest cell holds more than `maxSkew` × the mean — probe cost is
    * driven by the cells a query lands in, so a skewed quantizer makes
    * nprobe latency bimodal. (Empty cells are fine: they cost nothing.)
    * Driver sees k rows; rebuild with [[train]] + [[writeIndex]]. */
  def needsRebuild(spark: org.apache.spark.sql.SparkSession, path: String,
                   maxSkew: Double = 4.0): Boolean = {
    require(maxSkew >= 1, s"needsRebuild: maxSkew must be >= 1, got $maxSkew")
    val ns = cellStats(spark, path).select(col("n")).collect().map(_.getLong(0))
    ns.nonEmpty && ns.max.toDouble > maxSkew * (ns.sum.toDouble / ns.length)
  }

  /** READ-ONLY crash-staleness gate (round 16 — parity with
    * [[Hnsw]]'s requireNoPendingSwap): a `_plan.json` manifest under
    * the sibling `__maint_staging` dir means a maintenance swap
    * (reassign/delete/compact/upsert) COMMITTED but did not finish
    * installing — the on-disk cell mix may double or drop ids (and a
    * reassign's new centroids may not be live) until the swap rolls
    * forward. Readers refuse loud instead of serving it; every
    * maintenance op — including the append family — runs the recovery
    * on entry and clears the manifest. A staging dir WITHOUT a
    * manifest means the staging write itself crashed: the store was
    * never touched and stays readable. Gated here in [[readModel]],
    * the choke point every searchIndex* family passes through. */
  private def requireNoPendingSwap(spark: org.apache.spark.sql.SparkSession,
                                   path: String): Unit = {
    // asks the SAME StagedSwap the maintenance ops use (current AND
    // legacy staging names), so gate and recovery can never disagree
    maintSwap(spark, path, "read").pendingPlan.foreach { plan =>
      throw new IllegalArgumentException(
        s"IvfIndex: $path has a committed-but-unfinished maintenance swap " +
          s"($plan) — run any maintenance op (appendIndex/upsertIndex/" +
          "deleteFromIndex/reassignIndex/compactIndex) to roll it forward " +
          "before reading")
    }
  }

  /** This store family's [[graft.sources.StagedSwap]], from a path. */
  private def maintSwap(spark: org.apache.spark.sql.SparkSession, path: String,
                        op: String): graft.sources.StagedSwap = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    stagedSwap(fs, root, op)
  }

  /** Maintenance-op entry contract: roll forward any committed-but-
    * unfinished swap before touching the store (clears the read gate's
    * manifest). Called by EVERY maintenance op — the append family and
    * compactIndex as well as the swap-running ops. */
  private def recoverPending(spark: org.apache.spark.sql.SparkSession,
                             path: String, op: String): Unit =
    maintSwap(spark, path, op).recover()

  def readModel(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    requireNoPendingSwap(spark, path)
    val json = readSidecar(spark, path, "_centroids.json")
    // minimal parser for [[d,d,...],...] written by writeIndex
    val rows = json.trim.stripPrefix("[").stripSuffix("]").split("\\],\\s*\\[")
      .map(_.stripPrefix("[").stripSuffix("]"))
      .map(_.split(",").map(_.trim.toDouble))
    Model(rows)
  }

  /** Shared probe → score → per-query rerank tail of topK/searchIndex. */
  private def probeAndRerank(assigned: DataFrame, queries: DataFrame, model: Model,
                             k: Int, nprobe: Int, idCol: String, embCol: String,
                             queryIdCol: String, scale: Int): DataFrame = {
    val probes = broadcast(
      queries.select(col(queryIdCol), col(embCol).as("__qemb"),
        explode(cellsOf(col(embCol), model, nprobe)).as("cell")))
    val scored = assigned.join(probes, Seq("cell"))
      .select(col(queryIdCol), col(idCol),
        round(VectorFunctions.cosineSimilarity(col(embCol), col("__qemb")), scale).as("cos"))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col(queryIdCol), col(idCol), col("cos"), col("rn").cast("long").as("rn"))
  }

  /** Search a persisted index. The probed cell set is computed up front
    * and applied as a STATIC `cell IN (...)` filter — partition pruning
    * is guaranteed at the file listing, not left to dynamic-pruning
    * heuristics. (Queries are broadcast-small by contract, so collecting
    * their ≤ |queries|·nprobe cell ids is driver-trivial.) */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                  queries: DataFrame, k: Int, nprobe: Int,
                  idCol: String = "vec_id", embCol: String = "embedding",
                  queryIdCol: String = "qid", scale: Int = 4): DataFrame = {
    val model = readModel(spark, path)
    val probedCells = queries
      .select(explode(cellsOf(col(embCol), model, nprobe)).as("cell"))
      .distinct().collect().map(_.getInt(0).asInstanceOf[Any])
    val corpus = spark.read.parquet(path).where(col("cell").isin(probedCells: _*))
    probeAndRerank(corpus, queries, model, k, nprobe, idCol, embCol, queryIdCol, scale)
  }

  /** ITERATIVE FILTERED search — pgvector 0.8's headline "iterative
    * index scans", re-expressed for the persisted store: a selective
    * relational predicate (`WHERE category = … ORDER BY emb <-> q
    * LIMIT k`) can leave fewer than k survivors among the first
    * `nprobe` cells' candidates, and a fixed-probe search silently
    * returns short results. Here queries that come back short DOUBLE
    * their probe set and retry — geometric escalation, so total work is
    * ≤ 2× the final round — until they hold k survivors or every cell
    * was probed, at which point the result is EXACT over the filtered
    * corpus (the degeneration the oracle gates). A query keeps the
    * result of its FIRST satisfying round (pgvector's stop-at-k
    * semantics — deterministic, since cell ranking is).
    *
    * The predicate is applied IN the scan (`.where(pred)` beside the
    * static `cell IN` pruning), so at 100 TB each round reads only the
    * probed partitions AND pushes the filter to parquet — never
    * filter-after-fetch on the driver. Per-round satisfied/deficient
    * bookkeeping collects one (qid, count) row per query — queries are
    * broadcast-small by contract, same as the probe-cell collection. */
  def searchIndexFiltered(spark: org.apache.spark.sql.SparkSession, path: String,
                          queries: DataFrame, pred: Column, k: Int, nprobe: Int,
                          idCol: String = "vec_id", embCol: String = "embedding",
                          queryIdCol: String = "qid", scale: Int = 4,
                          maxResultRows: Int = 100000): DataFrame = {
    val model = readModel(spark, path)
    val kc = model.k
    var cur = math.max(1, math.min(nprobe, kc))
    var pending = queries
    // per-round results are ≤ |pending|·k rows (the window caps at k) and
    // queries are broadcast-small by contract, so each round COLLECTS its
    // result once — one Spark job per round; counting satisfied queries
    // and assembling the final frame are driver-side, never a
    // re-evaluation of the probe/rerank plan
    val kept = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    var schema: org.apache.spark.sql.types.StructType = null
    // the qid list is collected ONCE; every later round's pending set is
    // the previous round's unsatisfied array, already on the driver
    var pendingQids: Array[Any] =
      queries.select(col(queryIdCol)).distinct().collect().map(_.get(0))
    // serve-contract guard (the Hnsw.maxFilterIds convention): the final
    // frame is assembled driver-side, bounded by |queries|·k rows — an
    // oversized query batch belongs on the distributed searchIndex path,
    // not here, and fails fast instead of silently bottlenecking
    require(pendingQids.length.toLong * k <= maxResultRows,
      s"IvfIndex.searchIndexFiltered: |queries| (${pendingQids.length}) × k ($k) exceeds " +
        s"maxResultRows ($maxResultRows) — the iterative filtered scan assembles its result " +
        "driver-side by contract; split the query batch or raise maxResultRows explicitly")
    var rounds = 0
    while (rounds >= 0) {
      rounds += 1
      val res = filteredProbePlan(spark, path, model, pending, pred, k, cur,
        idCol, embCol, queryIdCol, scale)
      if (schema == null) schema = res.schema
      val rows = res.collect()
      if (cur >= kc) { // full probe: nothing more exists — exact by construction
        kept ++= rows
        return spark.createDataFrame(
          scala.jdk.CollectionConverters.SeqHasAsJava(kept.toSeq).asJava, schema)
      }
      val counts = rows.groupBy(_.get(0)).map { case (q, rs) => q -> rs.length }
      val (sat, unsat) = pendingQids.partition(q => counts.getOrElse(q, 0) >= k)
      val satSet = sat.toSet
      kept ++= rows.filter(r => satSet.contains(r.get(0)))
      if (unsat.isEmpty) // includes the empty-queries frame
        return spark.createDataFrame(
          scala.jdk.CollectionConverters.SeqHasAsJava(kept.toSeq).asJava, schema)
      pending = pending.where(col(queryIdCol).isin(unsat: _*))
      pendingQids = unsat
      cur = math.min(cur * 2, kc)
    }
    throw new IllegalStateException("unreachable")
  }

  /** ONE round of [[searchIndexFiltered]]: static cell pruning + the
    * relational predicate IN the scan + rerank. Package-visible so the
    * spec can assert the predicate reaches `PushedFilters` (the returned
    * frame of the iterative driver is a collected LocalRelation with no
    * scan left to inspect). */
  private[graft] def filteredProbePlan(spark: org.apache.spark.sql.SparkSession, path: String,
                                       model: Model, pending: DataFrame, pred: Column,
                                       k: Int, cur: Int, idCol: String, embCol: String,
                                       queryIdCol: String, scale: Int): DataFrame = {
    val probedCells = pending
      .select(explode(cellsOf(col(embCol), model, cur)).as("cell"))
      .distinct().collect().map(_.getInt(0).asInstanceOf[Any])
    val corpus = spark.read.parquet(path)
      .where(col("cell").isin(probedCells: _*))
      .where(pred)
    probeAndRerank(corpus, pending, model, k, cur, idCol, embCol, queryIdCol, scale)
  }

  /** Approximate top-k: probe `nprobe` cells per query, exact rerank. */
  def topK(corpus: DataFrame, queries: DataFrame, model: Model, k: Int, nprobe: Int,
           idCol: String = "vec_id", embCol: String = "embedding",
           queryIdCol: String = "qid", scale: Int = 4): DataFrame = {
    val assigned = corpus.select(col(idCol), col(embCol), cellOf(col(embCol), model).as("cell"))
    probeAndRerank(assigned, queries, model, k, nprobe, idCol, embCol, queryIdCol, scale)
  }

  /** Large-×-large approximate KNN JOIN: top-k right-side neighbors for
    * EVERY left row, where BOTH sides are corpus-sized — the operator
    * behind cross-corpus dedup and retrieval-pair mining. `Knn.topKBatch`
    * broadcasts the query side and dies when queries are millions of
    * rows; here neither side broadcasts: right rows land in their ONE
    * nearest cell, left rows probe their `nprobe` nearest cells, and the
    * match is a plain shuffle hash join on the integer cell id, followed
    * by a per-left-row top-k window. A pair can meet at most once (the
    * right row's cell is unique), so no dedup pass.
    *
    * Cost is Σ_cells |probesₗ(cell)|·|rowsᵣ(cell)| — the IVF-blocked
    * quadratic, controlled by the quantizer's balance (k cells ⇒ ~N²·
    * nprobe/k pairs); a skewed quantizer is exactly what
    * [[needsRebuild]] flags, and AQE's skew-join handles residual hot
    * cells at runtime. Recall is governed by nprobe like any IVF search
    * (spec-gated vs the exact join). */
  def knnJoin(left: DataFrame, right: DataFrame, model: Model, k: Int, nprobe: Int,
              leftIdCol: String = "qid", rightIdCol: String = "vec_id",
              embCol: String = "embedding", scale: Int = 4): DataFrame = {
    val probes = left.select(col(leftIdCol), col(embCol).as("__lemb"),
      explode(cellsOf(col(embCol), model, nprobe)).as("cell"))
    val assigned = right.select(col(rightIdCol), col(embCol).as("__remb"),
      cellOf(col(embCol), model).as("cell"))
    val scored = probes.join(assigned, Seq("cell"))
      .select(col(leftIdCol), col(rightIdCol),
        round(VectorFunctions.cosineSimilarity(col("__lemb"), col("__remb")), scale).as("cos"))
    val w = Window.partitionBy(col(leftIdCol)).orderBy(col("cos").desc, col(rightIdCol))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col(leftIdCol), col(rightIdCol), col("cos"), col("rn").cast("long").as("rn"))
  }

  /** Persist an IVF-SQ index: [[writeIndex]]'s cell-partitioned layout
    * PLUS a uint8 code column per vector (faiss IVF-SQ8's on-disk shape).
    * The two pruning levers compose at search time: partition pruning
    * reads only the probed `nprobe/k` fraction of the files, and within
    * them the coarse scoring pass reads only the code column — ¼ the
    * bytes of the float column. The quantization range rides in a
    * `_quantize.json` sidecar beside `_centroids.json`. */
  def writeIndexQuantized(corpus: DataFrame, model: Model, path: String,
                          mn: Double, mx: Double,
                          idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    corpus.select(col(idCol), col(embCol),
        Quantize.quantizeExpr(col(embCol), mn, mx).as("qvec"),
        cellOf(col(embCol), model).as("cell"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    val json = model.centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    writeSidecar(corpus.sparkSession, path, "_centroids.json", json)
    writeSidecar(corpus.sparkSession, path, "_quantize.json", s"""{"mn":$mn,"mx":$mx}""")
  }

  /** (mn, mx) range from the `_quantize.json` sidecar. */
  def readQuantRange(spark: org.apache.spark.sql.SparkSession, path: String): (Double, Double) = {
    val json = readSidecar(spark, path, "_quantize.json")
    val m = """"mn"\s*:\s*([-0-9.eE]+).*"mx"\s*:\s*([-0-9.eE]+)""".r.unanchored
    json match {
      case m(mn, mx) => (mn.toDouble, mx.toDouble)
      case _ => throw new IllegalStateException(s"IvfIndex: malformed _quantize.json at $path")
    }
  }

  /** Search a quantized index: static `cell IN` partition pruning, then a
    * CODE-COLUMN-ONLY coarse pass (integer code-L2 per query, top
    * `k·overfetch` by window), then a full-precision L2 rerank reading
    * float vectors for the bounded candidate-id set via static `id IN`
    * parquet pushdown. Output: `(qid, id, dist, rn)`, L2 ascending —
    * the pgvector `<->` family, like `Quantize.topKStore`, but with the
    * nprobe/k scan cut stacked on top of the 4× byte cut.
    *
    * The candidate-id set is `|queries|·k·overfetch` — bounded for the
    * serve contract (small query batches), but unbounded if someone
    * points this at a corpus-sized query frame. So the driver never
    * materializes more than `maxPushdownIds+1` ids (a `limit` probe,
    * the [[DedupIndex.searchIndex]] guard): at or under the cap the ids
    * push into the rerank read as a static `id IN` parquet filter
    * (row-group pruning); above it the rerank falls back to a semi join
    * against the distributed candidate frame — correct at any
    * cardinality, and AQE still broadcasts it when it turns out small. */
  def searchIndexQuantized(spark: org.apache.spark.sql.SparkSession, path: String,
                           queries: DataFrame, k: Int, nprobe: Int, overfetch: Int = 4,
                           idCol: String = "vec_id", embCol: String = "embedding",
                           queryIdCol: String = "qid", scale: Int = 4,
                           maxPushdownIds: Int = 100000): DataFrame = {
    val model = readModel(spark, path)
    val (mn, mx) = readQuantRange(spark, path)
    val probedCells = queries
      .select(explode(cellsOf(col(embCol), model, nprobe)).as("cell"))
      .distinct().collect().map(_.getInt(0).asInstanceOf[Any])
    val qSide = broadcast(queries.select(col(queryIdCol),
      col(embCol).as("__qemb"),
      Quantize.quantizeExpr(col(embCol), mn, mx).as("__qcodes")))
    // coarse: probed cells × queries, scored in the integer code domain;
    // the scan deserializes (id, qvec) only
    val coarse = spark.read.parquet(path)
      .where(col("cell").isin(probedCells: _*))
      .select(col(idCol), col("qvec"))
      .crossJoin(qSide)
      .select(col(queryIdCol), col(idCol),
        Quantize.codeL2Sq(col("qvec"), col("__qcodes")).as("__qdist"))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("__qdist"), col(idCol))
    // materialized once (localCheckpoint): the candidate frame feeds both
    // the bounded driver probe and, on fallback, the semi join — left
    // lazy, the coarse scan would run twice.
    val candFrame = coarse.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k * overfetch)
      .select(col(idCol)).distinct()
      .localCheckpoint(true)
    // bounded probe BEFORE the cardinality decision — the driver never
    // holds more than maxPushdownIds+1 ids even for a huge query frame
    val probe = candFrame.limit(maxPushdownIds + 1).collect()
    val rerankBase = spark.read.parquet(path)
      .where(col("cell").isin(probedCells: _*))
    val rerankDocs =
      if (probe.length <= maxPushdownIds)
        rerankBase.where(col(idCol).isin(probe.map(_.getLong(0)).toSeq: _*))
      else rerankBase.join(candFrame, Seq(idCol), "left_semi")
    // rerank: float column for candidate ids only, exact L2 per query
    val rerank = rerankDocs
      .select(col(idCol), col(embCol))
      .crossJoin(qSide)
      .select(col(queryIdCol), col(idCol),
        round(VectorFunctions.l2Distance(col(embCol), col("__qemb")), scale).as("dist"))
    val w2 = Window.partitionBy(col(queryIdCol)).orderBy(col("dist"), col(idCol))
    rerank.withColumn("rn", row_number().over(w2))
      .where(col("rn") <= k)
      .select(col(queryIdCol), col(idCol), col("dist"), col("rn").cast("long").as("rn"))
  }

  /** Persist a HALFVEC index — pgvector 0.7's `halfvec_l2_ops` recipe
    * (index over `embedding::halfvec(d)`, the memory-halving move real
    * deployments use) on the cell-partitioned layout: rows carry the
    * full float column PLUS an IEEE-754 binary16 code column (`hvec`,
    * round-to-nearest-even — [[graft.functions.HalfExpressions]]), and
    * a `_half.json` sidecar marks the tier. At search time the coarse
    * pass reads (id, hvec) only — half the bytes of the float column —
    * and the float column is deserialized just for the bounded rerank
    * candidates: [[writeIndexSub]]'s IO pattern with the cut coming
    * from precision instead of prefix length. */
  /** The half tier's hvec layout is versioned: "packed2" = 2-byte/dim
    * binary (the only layout the current scan and append paths speak).
    * A `_half.json` without the field is a pre-packing store whose hvec
    * is `array<short>` — appending binary rows to it would write
    * mixed-physical-type parquet that fails at schema merge AFTER the
    * store is already poisoned, so every maintenance/read path refuses
    * it loud up front and points at the rebuild. */
  /** True iff the `_half.json` sidecar declares the packed2 layout —
    * THE version check: the rewrite rule and every maintenance/read
    * path must agree on it, so it lives here once. */
  private[graft] def isPackedHalf(spark: org.apache.spark.sql.SparkSession,
                                  path: String): Boolean =
    """"format"\s*:\s*"packed2"""".r
      .findFirstIn(readSidecar(spark, path, "_half.json")).isDefined

  private def requirePackedHalf(spark: org.apache.spark.sql.SparkSession,
                                path: String, op: String): Unit = {
    // existence first, not a swallowed read: appending/searching a
    // non-half path must yield the clean family message (a transient IO
    // fault on the sidecar READ still surfaces as itself below) — ONE
    // copy of the family gate for every half read/maintenance path
    val marker = new org.apache.hadoop.fs.Path(path, "_half.json")
    require(marker.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(marker),
      s"$op: $path carries no _half.json — not a halfvec index")
    require(isPackedHalf(spark, path),
      s"$op: $path is a pre-packed-layout halfvec store (hvec as array<short>) — " +
        "rebuild with writeIndexHalf to migrate to the 2-byte packed binary layout")
  }

  def writeIndexHalf(corpus: DataFrame, model: Model, path: String,
                     idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    import graft.functions.HalfExpressions
    corpus.select(col(idCol), col(embCol),
        HalfExpressions.halfPack(col(embCol)).as("hvec"),
        cellOf(col(embCol), model).as("cell"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    val json = model.centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    writeSidecar(corpus.sparkSession, path, "_centroids.json", json)
    writeSidecar(corpus.sparkSession, path, "_half.json",
      """{"bits":16,"format":"packed2"}""")
  }

  /** Append to a [[writeIndexHalf]] store — the [[appendIndex]] contract
    * with the half codes recomputed for the new rows. */
  def appendIndexHalf(spark: org.apache.spark.sql.SparkSession, path: String,
                      vectors: DataFrame,
                      idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    import graft.functions.HalfExpressions
    requirePackedHalf(spark, path, "appendIndexHalf")
    recoverPending(spark, path, "appendIndexHalf")
    val model = readModel(spark, path)
    vectors.select(col(idCol), col(embCol),
        HalfExpressions.halfPack(col(embCol)).as("hvec"),
        cellOf(col(embCol), model).as("cell"))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(path)
  }

  /** Search a [[writeIndexHalf]] store — [[searchIndexQuantized]]'s
    * exact scan shape with binary16 in place of uint8 codes: static
    * `cell IN` pruning, an (id, hvec)-only coarse pass scored by L2 in
    * the HALF domain (both sides rounded to binary16, the pgvector
    * halfvec semantics), then an exact float-L2 rerank of the bounded
    * candidate set with the id-pushdown/semi-join fallback. Full probe
    * + covering overfetch degenerates to exact KNN (oracle-gated as
    * q_ann_half_exact); recall at production overfetch is spec-gated. */
  def searchIndexHalf(spark: org.apache.spark.sql.SparkSession, path: String,
                      queries: DataFrame, k: Int, nprobe: Int, overfetch: Int = 4,
                      idCol: String = "vec_id", embCol: String = "embedding",
                      queryIdCol: String = "qid", scale: Int = 4,
                      maxPushdownIds: Int = 100000): DataFrame = {
    import graft.functions.HalfExpressions
    // the family gate runs BEFORE readModel so a non-index path fails
    // on the family, not on a missing centroid sidecar
    requirePackedHalf(spark, path, "searchIndexHalf")
    val model = readModel(spark, path)
    val probedCells = queries
      .select(explode(cellsOf(col(embCol), model, nprobe)).as("cell"))
      .distinct().collect().map(_.getInt(0).asInstanceOf[Any])
    val qSide = broadcast(queries.select(col(queryIdCol),
      col(embCol).as("__qemb"),
      HalfExpressions.halfDecode(
        HalfExpressions.halfEncode(col(embCol))).as("__qhalf")))
    val coarse = spark.read.parquet(path)
      .where(col("cell").isin(probedCells: _*))
      .select(col(idCol), col("hvec"))
      .crossJoin(qSide)
      .select(col(queryIdCol), col(idCol),
        VectorFunctions.l2Distance(
          HalfExpressions.halfUnpack(col("hvec")), col("__qhalf")).as("__hdist"))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("__hdist"), col(idCol))
    val candFrame = coarse.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k * overfetch)
      .select(col(idCol)).distinct()
      .localCheckpoint(true)
    val probe = candFrame.limit(maxPushdownIds + 1).collect()
    val rerankBase = spark.read.parquet(path)
      .where(col("cell").isin(probedCells: _*))
    val rerankDocs =
      if (probe.length <= maxPushdownIds)
        rerankBase.where(col(idCol).isin(probe.map(_.getLong(0)).toSeq: _*))
      else rerankBase.join(candFrame, Seq(idCol), "left_semi")
    val rerank = rerankDocs
      .select(col(idCol), col(embCol))
      .crossJoin(qSide)
      .select(col(queryIdCol), col(idCol),
        round(VectorFunctions.l2Distance(col(embCol), col("__qemb")), scale).as("dist"))
    val w2 = Window.partitionBy(col(queryIdCol)).orderBy(col("dist"), col(idCol))
    rerank.withColumn("rn", row_number().over(w2))
      .where(col("rn") <= k)
      .select(col(queryIdCol), col(idCol), col("dist"), col("rn").cast("long").as("rn"))
  }

  /** Persist a MATRYOSHKA index — the pgvector "subvector index" recipe
    * (index `subvector(embedding, 1, d')::vector(d')`, rerank by the
    * full column) re-expressed as a cell-partitioned store: rows carry
    * the full embedding PLUS its `sub` prefix (first `subDim` dims), and
    * cells come from centroids trained in the PREFIX space (pass a
    * `model` of dimension `subDim` — [[trainSub]] builds one). MRL-style
    * embeddings front-load information, so the d'-dim prefix preserves
    * neighborhood structure at subDim/dim of the bytes; at 100 TB the
    * coarse pass reads only (id, sub) via parquet column pruning — a
    * subDim/dim IO cut on top of the nprobe/k partition cut — and the
    * full float column is only deserialized for the bounded rerank
    * candidates. `_matryoshka.json` records subDim. */
  def writeIndexSub(corpus: DataFrame, model: Model, path: String, subDim: Int,
                    idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    require(subDim >= 1, s"writeIndexSub: subDim must be >= 1, got $subDim")
    require(model.centroids.headOption.forall(_.length == subDim),
      s"writeIndexSub: model dimension ${model.centroids.headOption.map(_.length)} " +
        s"!= subDim $subDim — train the coarse quantizer in the prefix space (trainSub)")
    val sub = slice(col(embCol), 1, subDim)
    corpus.select(col(idCol), col(embCol), sub.as("sub"),
        cellOf(sub, model).as("cell"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    val json = model.centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    writeSidecar(corpus.sparkSession, path, "_centroids.json", json)
    writeSidecar(corpus.sparkSession, path, "_matryoshka.json", s"""{"subDim":$subDim}""")
  }

  /** Coarse quantizer for [[writeIndexSub]]: k-means in the prefix space. */
  def trainSub(corpus: DataFrame, subDim: Int, k: Int, iters: Int = 5,
               idCol: String = "vec_id", embCol: String = "embedding",
               samplePercent: Int = 10): Model =
    train(corpus.select(col(idCol), slice(col(embCol), 1, subDim).as(embCol)),
      k, iters, idCol, embCol, samplePercent)

  /** subDim from the `_matryoshka.json` sidecar. */
  def readSubDim(spark: org.apache.spark.sql.SparkSession, path: String): Int = {
    val json = readSidecar(spark, path, "_matryoshka.json")
    """"subDim"\s*:\s*(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(
        s"IvfIndex: malformed _matryoshka.json at $path"))
  }

  /** Search a Matryoshka index: static `cell IN` partition pruning in
    * the prefix space, a PREFIX-COLUMN-ONLY coarse pass (L2 over the
    * first subDim dims, top `k·overfetch` per query), then an exact
    * full-dimension L2 rerank reading float vectors for the bounded
    * candidate-id set — [[searchIndexQuantized]]'s scan shape with the
    * byte cut coming from column pruning instead of integer codes.
    * Output `(qid, id, dist, rn)`, L2 ascending. Degeneration: nprobe ≥
    * cells and overfetch covering the corpus ⇒ exact KNN (oracle-gated
    * as q_ann_matryoshka_exact). */
  def searchIndexSub(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, k: Int, nprobe: Int, overfetch: Int = 4,
                     idCol: String = "vec_id", embCol: String = "embedding",
                     queryIdCol: String = "qid", scale: Int = 4,
                     maxPushdownIds: Int = 100000): DataFrame = {
    val model = readModel(spark, path)
    val subDim = readSubDim(spark, path)
    val qSub = slice(col(embCol), 1, subDim)
    val probedCells = queries
      .select(explode(cellsOf(qSub, model, nprobe)).as("cell"))
      .distinct().collect().map(_.getInt(0).asInstanceOf[Any])
    val qSide = broadcast(queries.select(col(queryIdCol),
      col(embCol).as("__qemb"), qSub.as("__qsub")))
    // coarse: probed cells × queries in the prefix space; the scan
    // deserializes (id, sub) only — subDim/dim of the vector bytes
    val coarse = spark.read.parquet(path)
      .where(col("cell").isin(probedCells: _*))
      .select(col(idCol), col("sub"))
      .crossJoin(qSide)
      .select(col(queryIdCol), col(idCol),
        VectorFunctions.l2DistanceSq(col("sub"), col("__qsub")).as("__qdist"))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("__qdist"), col(idCol))
    val candFrame = coarse.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k * overfetch)
      .select(col(idCol)).distinct()
      .localCheckpoint(true)
    // bounded driver probe, then id IN pushdown or semi-join fallback —
    // the searchIndexQuantized guard verbatim
    val probe = candFrame.limit(maxPushdownIds + 1).collect()
    val rerankBase = spark.read.parquet(path)
      .where(col("cell").isin(probedCells: _*))
    val rerankDocs =
      if (probe.length <= maxPushdownIds)
        rerankBase.where(col(idCol).isin(probe.map(_.getLong(0)).toSeq: _*))
      else rerankBase.join(candFrame, Seq(idCol), "left_semi")
    val rerank = rerankDocs
      .select(col(idCol), col(embCol))
      .crossJoin(qSide)
      .select(col(queryIdCol), col(idCol),
        round(VectorFunctions.l2Distance(col(embCol), col("__qemb")), scale).as("dist"))
    val w2 = Window.partitionBy(col(queryIdCol)).orderBy(col("dist"), col(idCol))
    rerank.withColumn("rn", row_number().over(w2))
      .where(col("rn") <= k)
      .select(col(queryIdCol), col(idCol), col("dist"), col("rn").cast("long").as("rn"))
  }

  /** The staged-swap machinery ([[graft.sources.StagedSwap]]) bound to
    * this family's layout: `cell=` partition dirs, the `_centroids.json`
    * sidecar riding reassign manifests, and the legacy `__reassign_*`
    * sibling names still rolled forward on recovery. */
  private def stagedSwap(fs: org.apache.hadoop.fs.FileSystem,
                         root: org.apache.hadoop.fs.Path, op: String) =
    new graft.sources.StagedSwap(fs, root, op, partPrefix = "cell=",
      sidecarName = "_centroids.json", legacySuffixes = Seq("__reassign"))

  final case class ReassignReport(rows: Long, moved: Long,
                                  cellsRewritten: Int, cellsTotal: Int)

  /** PARTIAL re-clustering of a persisted index under a retrained
    * model — the 100 TB alternative to a full [[writeIndex]] rebuild: a
    * full rebuild rewrites every byte of the store, but after modest
    * drift most rows keep their cell, so only the partitions whose
    * MEMBERSHIP changed (either side of any move) need rewriting. Rows
    * are re-assigned under `newModel`; the moved-row batch is staged to
    * a sibling directory partitioned by new cell, and then exactly the
    * changed `cell=` partitions are swapped in (old partition retired →
    * staged partition renamed in → staging then retire dir dropped).
    * The centroid sidecar is rewritten last.
    *
    * Store families: plain, SQ (qvec is range-coded, cell-independent),
    * binary (sign-coded), cosine (stored vectors are normalized — train
    * `newModel` on normalized data), and Matryoshka (assignment runs on
    * the stored `sub` prefix; `newModel` must be subDim-dimensional).
    * PQ stores are REFUSED: their codes quantize the residual against
    * the row's cell centroid, so a moved row's codes go stale — a PQ
    * re-clustering is a rebuild ([[writeIndexPq]]) by construction.
    *
    * Crash safety (single-writer contract, like the append family): the
    * staged batch carries a `_plan.json` manifest naming every cell to
    * rewrite or drain, written only after the parquet staging completed
    * — it is the commit point. A crash at any later step leaves a state
    * the next call ROLLS FORWARD deterministically from the manifest
    * (install what's still staged, drop what drained) before starting
    * its own work; a crash before the manifest leaves the store
    * untouched and the partial staging is dropped. In-between states
    * keep the OLD sidecar against a partially moved layout — searches
    * stay exact within their probed cells (recall can dip until the
    * roll-forward completes; no wrong rows). */
  def reassignIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    newModel: Model,
                    idCol: String = "vec_id", embCol: String = "embedding"): ReassignReport = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(root, "_pq.json")),
      "reassignIndex: PQ stores code residuals against their cell centroid — " +
        "moved rows would carry stale codes; rebuild with writeIndexPq instead")
    val isSub = fs.exists(new Path(root, "_matryoshka.json"))
    val assignCol = if (isSub) col("sub") else col(embCol)
    if (isSub) {
      val d = readSubDim(spark, path)
      require(newModel.centroids.headOption.forall(_.length == d),
        s"reassignIndex: Matryoshka store has subDim $d but the new model is " +
          s"${newModel.centroids.headOption.map(_.length)}-dimensional (trainSub)")
    }
    val swap = stagedSwap(fs, root, "reassignIndex")
    swap.recover()

    val assigned = spark.read.parquet(path)
      .withColumn("__new", cellOf(assignCol, newModel))
    // one corpus pass: (old, new) pair counts — ≤ oldK·newK rows — give
    // the row total, the moved count, and the changed-cell set at once
    val pairCounts = assigned.groupBy(col("cell"), col("__new")).count().collect()
    val rows = pairCounts.map(_.getLong(2)).sum
    val movedPairs = pairCounts.filter(r => r.getInt(0) != r.getInt(1))
    val moved = movedPairs.map(_.getLong(2)).sum
    val changed: Set[Int] =
      movedPairs.flatMap(r => Seq(r.getInt(0), r.getInt(1))).toSet
    if (changed.nonEmpty) {
      // the new content of every changed partition, staged off to the side
      // (reads the live store — it is not mutated until the swap below).
      // {__new ∈ changed} ⟺ {cell ∈ changed}: a mover puts BOTH its old
      // and new cell into the changed set, and a non-mover has
      // __new == cell — so the equivalent filter on the PARTITION column
      // rides along and prunes the staging read to the changed
      // partitions (the computed-column filter alone would rescan the
      // whole store, turning phase A from O(changed) into O(corpus))
      val changedLits = changed.toSeq.map(_.asInstanceOf[Any])
      assigned.where(col("cell").isin(changedLits: _*) &&
          col("__new").isin(changedLits: _*))
        .drop("cell").withColumnRenamed("__new", "cell")
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(swap.staging.toString)
      // the new centroids ride the manifest: recovery of ANY later crash
      // point restores them, so the data can never stay moved under the
      // old sidecar (the sidecar write below only covers the
      // nothing-changed case, where no swap happens at all)
      swap.commit(changed, Some(json(newModel)))
    }
    writeSidecar(spark, path, "_centroids.json", json(newModel))
    ReassignReport(rows, moved, changed.size, newModel.k)
  }

  private def json(m: Model): String =
    m.centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  final case class DeleteReport(deleted: Long, cellsRewritten: Int, cellsDrained: Int)

  /** Partition-surgical DELETE from a persisted index — the pgvector
    * `DELETE FROM items WHERE id IN (...)` maintenance move for the
    * cell-partitioned stores: one (id, cell)-column pass finds the
    * affected cells and the per-cell hit counts, only those partitions
    * are rewritten without the deleted rows (anti join, staged +
    * manifest-committed + swapped through the same [[graft.sources.StagedSwap]]
    * machinery as [[reassignIndex]], so a crash at any point rolls
    * forward), and a cell whose rows are all deleted is drained. Works
    * for every root-level cell-partitioned family — flat, SQ8, PQ
    * (per-row codes stay valid under deletion), binary, cosine,
    * Matryoshka. Streaming `batch_id/cell` stores are refused: their
    * cell dirs are nested under batch partitions, so a root-level swap
    * would leave the old rows live — compact to a cell-partitioned
    * store first. `ids` may be any size (the anti join shuffles; AQE
    * broadcasts it when small) — but if it DERIVES from this same
    * store, materialize it first (`localCheckpoint`): the swap
    * invalidates the file listing its lineage captured, so re-using it
    * after the call would fail on the retired files. */
  def deleteFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      ids: DataFrame, idCol: String = "vec_id"): DeleteReport = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val swap = stagedSwap(fs, root, "deleteFromIndex")
    swap.recover()
    val store = spark.read.parquet(path)
    require(!store.columns.contains("batch_id"),
      "deleteFromIndex: streaming batch_id/cell stores nest their cell dirs under " +
        "batch partitions — a root-level swap would leave old rows live; " +
        "compact to a cell-partitioned store first")
    // materialized once: the frame feeds BOTH the hit-count pass and the
    // anti-join staging write — an expensive derived ids plan would
    // otherwise recompute in full for the second job
    val idFrame = ids.select(col(idCol)).distinct().localCheckpoint(true)
    // one pass over the (id, cell) columns: affected cells + hit counts
    val hits = store.select(col(idCol), col("cell"))
      .join(idFrame, Seq(idCol), "left_semi")
      .groupBy(col("cell")).count().collect()
    val deleted = hits.map(_.getLong(1)).sum
    val affected: Set[Int] = hits.map(_.getInt(0)).toSet
    if (affected.isEmpty) return DeleteReport(0L, 0, 0)
    // survivors of the affected partitions only (cell IN prunes the read)
    store.where(col("cell").isin(affected.toSeq.map(_.asInstanceOf[Any]): _*))
      .join(idFrame, Seq(idCol), "left_anti")
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(swap.staging.toString)
    val (rewrite, drain) = swap.commit(affected)
    DeleteReport(deleted, rewrite.size, drain.size)
  }

  final case class UpsertReport(updatedIds: Long, insertedIds: Long,
                                cellsRewritten: Int, cellsDrained: Int)

  /** UPSERT into a persisted index — the reference's core trigger is a
    * RE-uploaded blob (BlobUploadDetector/.../Function.java:71-88: same
    * name, new content ⇒ re-embed and replace), and at the index tier
    * that is delete + insert which MUST be atomic: two separate
    * maintenance ops leave a window where the doc is either absent or
    * doubled. This composes both under ONE [[graft.sources.StagedSwap]] manifest —
    * exactly [[deleteFromIndex]]'s and [[reassignIndex]]'s protocol, so
    * a crash at any point rolls FORWARD on the next maintenance call and
    * no intermediate state is ever live.
    *
    * Family-aware: the batch rows are written in the store's own schema,
    * detected from its sidecars — flat, cosine (vectors normalized on
    * the way in), SQ8 (codes under the stored range), binary (packed
    * sign bits), PQ (residual codes under the stored codebooks),
    * Matryoshka (prefix slice + prefix-space cells). An id may move
    * cells when its new embedding lands elsewhere — the old cell is
    * rewritten without it, the new cell with it, both under the one
    * manifest; a cell left empty drains.
    *
    * Cost: O(affected cells), like [[deleteFromIndex]]. `vectors` must
    * carry one row per id (ambiguous multi-row upserts fail loud); if it
    * derives from this same store, it is materialized here before the
    * swap invalidates the captured file listing. Idempotent: re-running
    * the same batch converges to the same store. */
  def upsertIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                  vectors: DataFrame,
                  idCol: String = "vec_id", embCol: String = "embedding"): UpsertReport = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val swap = stagedSwap(fs, root, "upsertIndex")
    swap.recover()
    val store = spark.read.parquet(path)
    require(!store.columns.contains("batch_id"),
      "upsertIndex: streaming batch_id/cell stores nest their cell dirs under " +
        "batch partitions — a root-level swap would leave old rows live; " +
        "compact to a cell-partitioned store first")
    val model = readModel(spark, path)
    // family detection by sidecar — the batch must be written in the
    // store's own schema or every later search breaks on the new rows
    val isSub = fs.exists(new Path(root, "_matryoshka.json"))
    val isPq = fs.exists(new Path(root, "_pq.json"))
    val isBin = fs.exists(new Path(root, "_binary.json"))
    val isSq = fs.exists(new Path(root, "_quantize.json"))
    val isHalf = fs.exists(new Path(root, "_half.json"))
    val isCos = readMetric(spark, path) == "cosine"
    val batchRows: DataFrame =
      if (isHalf) {
        import graft.functions.HalfExpressions
        requirePackedHalf(spark, path, "upsertIndex")
        vectors.select(col(idCol), col(embCol),
          HalfExpressions.halfPack(col(embCol)).as("hvec"),
          cellOf(col(embCol), model).as("cell"))
      } else if (isSub) {
        val subDim = readSubDim(spark, path)
        val sub = slice(col(embCol), 1, subDim)
        vectors.select(col(idCol), col(embCol), sub.as("sub"), cellOf(sub, model).as("cell"))
      } else if (isPq) {
        val pq = ProductQuantizer.readModel(spark, path)
        vectors.select(col(idCol), col(embCol), cellOf(col(embCol), model).as("cell"))
          .select(col(idCol), col(embCol), col("cell"),
            ProductQuantizer.encodeExpr(
              ProductQuantizer.residualExpr(col(embCol), col("cell"), model), pq).as("pq_codes"))
      } else if (isBin) {
        vectors.select(col(idCol), col(embCol),
          Quantize.binarizeExpr(col(embCol)).as("bvec"), cellOf(col(embCol), model).as("cell"))
      } else if (isSq) {
        val (mn, mx) = readQuantRange(spark, path)
        vectors.select(col(idCol), col(embCol),
          Quantize.quantizeExpr(col(embCol), mn, mx).as("qvec"),
          cellOf(col(embCol), model).as("cell"))
      } else if (isCos) {
        val n = graft.functions.VectorFunctions.l2Normalize(col(embCol))
        vectors.select(col(idCol), n.as(embCol), cellOf(n, model).as("cell"))
      } else {
        vectors.select(col(idCol), col(embCol), cellOf(col(embCol), model).as("cell"))
      }
    // materialized once: feeds the ambiguity check, the hit pass, the
    // changed-cell set and the staging write — and decouples the batch
    // from any lineage over the store about to be swapped. Columns are
    // cast to the STORE's schema first (a float-vector store upserted
    // with double-typed arithmetic would otherwise write mixed-type
    // partitions the merged read chokes on).
    val batch = batchRows.select(store.schema.fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)
      .localCheckpoint(true)
    val dup = batch.groupBy(col(idCol)).count().where(col("count") > 1)
      .limit(5).collect().map(_.get(0))
    require(dup.isEmpty,
      s"upsertIndex: ids ${dup.mkString(",")}… appear more than once in the batch — " +
        "an upsert must carry exactly one row per id")
    val idFrame = batch.select(col(idCol))
    // one (id, cell)-column pass over the store: cells losing rows +
    // the distinct-id count that tells updates from inserts
    val hits = store.select(col(idCol), col("cell"))
      .join(idFrame, Seq(idCol), "left_semi")
      .groupBy(col("cell")).agg(countDistinct(col(idCol)).as("ids")).collect()
    val updatedIds = hits.map(_.getLong(1)).sum
    val oldCells: Set[Int] = hits.map(_.getInt(0)).toSet
    val newCells: Set[Int] = batch.select(col("cell")).distinct().collect().map(_.getInt(0)).toSet
    val changed = oldCells ++ newCells
    val changedLits = changed.toSeq.map(_.asInstanceOf[Any])
    // staged content of every changed cell: that cell's survivors plus
    // the batch rows landing there — the `cell IN` filter prunes the
    // store read to the affected partitions only
    val survivors = store.where(col("cell").isin(changedLits: _*))
      .join(idFrame, Seq(idCol), "left_anti")
    survivors.unionByName(batch)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(swap.staging.toString)
    val (rewrite, drain) = swap.commit(changed)
    UpsertReport(updatedIds, batch.count() - updatedIds, rewrite.size, drain.size)
  }

  /** Append vectors to a persisted Matryoshka index: slice the prefix
    * and assign cells under the EXISTING sidecar model, so appended rows
    * stay scan-compatible with both the coarse (sub) and rerank
    * (embedding) passes. Same append-only contract as [[appendIndex]];
    * compact on the usual cadence. */
  def appendIndexSub(spark: org.apache.spark.sql.SparkSession, path: String,
                     vectors: DataFrame,
                     idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    recoverPending(spark, path, "appendIndexSub")
    val model = readModel(spark, path)
    val subDim = readSubDim(spark, path)
    val sub = slice(col(embCol), 1, subDim)
    vectors.select(col(idCol), col(embCol), sub.as("sub"),
        cellOf(sub, model).as("cell"))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(path)
  }

  /** Persist an IVF-BINARY index: [[writeIndex]]'s cell-partitioned
    * layout PLUS the packed sign-bit column ([[Quantize.binarizeExpr]])
    * — the 32× compression point of the quantization ladder inside the
    * inverted-file layout (pgvector's bit-vector family meeting its
    * ivfflat layout). At search time three levers compose: `cell IN`
    * partition pruning (nprobe/k of the files), a coarse pass reading
    * only (id, bvec) — 1/32 the bytes of the float column — scored by
    * integer Hamming, and exact-L2 rerank of the bounded candidates.
    * A `_binary.json` sidecar marks the store. */
  def writeIndexBinary(corpus: DataFrame, model: Model, path: String,
                       idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    corpus.select(col(idCol), col(embCol),
        Quantize.binarizeExpr(col(embCol)).as("bvec"),
        cellOf(col(embCol), model).as("cell"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    val json = model.centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    writeSidecar(corpus.sparkSession, path, "_centroids.json", json)
    writeSidecar(corpus.sparkSession, path, "_binary.json", """{"bits":32}""")
  }

  /** Search a [[writeIndexBinary]] store — [[searchIndexQuantized]]'s
    * exact shape with Hamming in place of code-L2: cell partition
    * pruning, (id, bvec)-only coarse scan, bounded candidate-id rerank
    * pushdown with the semi-join fallback. Full probe + covering
    * overfetch degenerates to exact KNN (the binary coarse pass is a
    * pre-filter; the rerank is exact L2) — oracle-gated. Default
    * overfetch is higher than SQ8's: one sign bit per dim is the
    * lossiest codec on the ladder. */
  def searchIndexBinary(spark: org.apache.spark.sql.SparkSession, path: String,
                        queries: DataFrame, k: Int, nprobe: Int, overfetch: Int = 8,
                        idCol: String = "vec_id", embCol: String = "embedding",
                        queryIdCol: String = "qid", scale: Int = 4,
                        maxPushdownIds: Int = 100000): DataFrame = {
    require(
      try { readSidecar(spark, path, "_binary.json"); true } catch { case _: Exception => false },
      s"searchIndexBinary: $path carries no _binary.json — not a binary index")
    val model = readModel(spark, path)
    val probedCells = queries
      .select(explode(cellsOf(col(embCol), model, nprobe)).as("cell"))
      .distinct().collect().map(_.getInt(0).asInstanceOf[Any])
    val qSide = broadcast(queries.select(col(queryIdCol),
      col(embCol).as("__qemb"),
      Quantize.binarizeExpr(col(embCol)).as("__qbits")))
    val coarse = spark.read.parquet(path)
      .where(col("cell").isin(probedCells: _*))
      .select(col(idCol), col("bvec"))
      .crossJoin(qSide)
      .select(col(queryIdCol), col(idCol),
        Quantize.hammingExpr(col("bvec"), col("__qbits")).as("__qdist"))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("__qdist"), col(idCol))
    val candFrame = coarse.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k * overfetch)
      .select(col(idCol)).distinct()
      .localCheckpoint(true)
    val probe = candFrame.limit(maxPushdownIds + 1).collect()
    val rerankBase = spark.read.parquet(path)
      .where(col("cell").isin(probedCells: _*))
    val rerankDocs =
      if (probe.length <= maxPushdownIds)
        rerankBase.where(col(idCol).isin(probe.map(_.getLong(0)).toSeq: _*))
      else rerankBase.join(candFrame, Seq(idCol), "left_semi")
    val rerank = rerankDocs
      .select(col(idCol), col(embCol))
      .crossJoin(qSide)
      .select(col(queryIdCol), col(idCol),
        round(VectorFunctions.l2Distance(col(embCol), col("__qemb")), scale).as("dist"))
    val w2 = Window.partitionBy(col(queryIdCol)).orderBy(col("dist"), col(idCol))
    rerank.withColumn("rn", row_number().over(w2))
      .where(col("rn") <= k)
      .select(col(queryIdCol), col(idCol), col("dist"), col("rn").cast("long").as("rn"))
  }

  /** Persist a COSINE-metric IVF index — pgvector's `vector_cosine_ops`
    * analogue: vectors are L2-NORMALIZED at write (cosine is
    * scale-invariant, so nothing is lost), cells are assigned under a
    * `model` trained on the NORMALIZED corpus (caller trains with
    * `train(corpus.withColumn(emb, l2Normalize(emb)))` — enforced only
    * by contract, like every model/store pairing here), and the
    * `_metric.json` sidecar records the opclass so searches — and the
    * `IvfScanRewriteRule` planner path — refuse to mix metrics. On the
    * unit sphere ‖â−b̂‖² = 2·(1−cos), so L2 cell probing preserves
    * cosine order exactly. */
  def writeIndexCosine(corpus: DataFrame, model: Model, path: String,
                       idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    writeIndex(
      corpus.withColumn(embCol, VectorFunctions.l2Normalize(col(embCol))),
      model, path, idCol, embCol)
    writeSidecar(corpus.sparkSession, path, "_metric.json", """{"metric":"cosine"}""")
  }

  /** The store's distance opclass: `"cosine"` when `_metric.json` says
    * so, `"l2"` otherwise (the default for every store written before
    * the sidecar existed). */
  def readMetric(spark: org.apache.spark.sql.SparkSession, path: String): String =
    try {
      val json = readSidecar(spark, path, "_metric.json")
      if (json.contains("cosine")) "cosine" else "l2"
    } catch { case _: Exception => "l2" }

  /** Shared body of the metric-variant searches ([[searchIndexCosine]]/
    * [[searchIndexIp]]/[[searchIndexL1]]): probe cells by the coarse L2
    * geometry, static `cell IN` pruning, cross-join against the
    * broadcast-small query side, round-then-rank by `distFn`. One
    * definition so a fix to the probe/rank shape cannot drift across
    * the three opclasses. */
  private def searchIndexByMetric(spark: org.apache.spark.sql.SparkSession, path: String,
                                  model: Model, queries: DataFrame, k: Int, nprobe: Int,
                                  idCol: String, embCol: String, queryIdCol: String,
                                  scale: Int, distFn: (Column, Column) => Column): DataFrame = {
    val probedCells = queries
      .select(explode(cellsOf(col(embCol), model, nprobe)).as("cell"))
      .distinct().collect().map(_.getInt(0).asInstanceOf[Any])
    val corpus = spark.read.parquet(path).where(col("cell").isin(probedCells: _*))
    val qSide = broadcast(queries.select(col(queryIdCol), col(embCol).as("__qemb")))
    val scored = corpus.crossJoin(qSide)
      .select(col(queryIdCol), col(idCol),
        round(distFn(col(embCol), col("__qemb")), scale).as("dist"))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("dist"), col(idCol))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col(queryIdCol), col(idCol), col("dist"), col("rn").cast("long").as("rn"))
  }

  /** Search a [[writeIndexCosine]] store: queries are normalized, cells
    * probed by L2 (order-equivalent on the unit sphere), and the rerank
    * reports COSINE DISTANCE (pgvector `<=>`), ascending, ties by id —
    * output `(qid, id, dist, rn)` like [[searchIndex]]. */
  def searchIndexCosine(spark: org.apache.spark.sql.SparkSession, path: String,
                        queries: DataFrame, k: Int, nprobe: Int,
                        idCol: String = "vec_id", embCol: String = "embedding",
                        queryIdCol: String = "qid", scale: Int = 4): DataFrame = {
    require(readMetric(spark, path) == "cosine",
      s"searchIndexCosine: $path is not a cosine-metric index (write with writeIndexCosine)")
    val model = readModel(spark, path)
    val qn = queries.withColumn(embCol, VectorFunctions.l2Normalize(col(embCol)))
    searchIndexByMetric(spark, path, model, qn, k, nprobe, idCol, embCol, queryIdCol,
      scale, VectorFunctions.cosineDistance)
  }

  /** INNER-PRODUCT search over an L2-metric index — pgvector's
    * `vector_ip_ops` analogue (`<#>` = negative inner product,
    * ascending). Cells are probed by L2 to the query (the faiss
    * IVF-with-METRIC_INNER_PRODUCT recipe: the coarse quantizer keeps
    * its L2 geometry); the rerank scores -⟨corpus, q⟩. MIPS recall under
    * L2 probing is the known weak spot of every IVF-IP index — a
    * high-IP vector with a large norm can sit in a far cell — so the
    * recall knob is `nprobe`, and full probe degenerates to the exact
    * answer (spec-pinned). On a cosine store the vectors are normalized,
    * where IP ordering equals cosine — use [[searchIndexCosine]]. */
  def searchIndexIp(spark: org.apache.spark.sql.SparkSession, path: String,
                    queries: DataFrame, k: Int, nprobe: Int,
                    idCol: String = "vec_id", embCol: String = "embedding",
                    queryIdCol: String = "qid", scale: Int = 4): DataFrame = {
    require(readMetric(spark, path) == "l2",
      s"searchIndexIp: $path is a cosine-metric (normalized) index — IP ordering " +
        "equals cosine there; use searchIndexCosine")
    val model = readModel(spark, path)
    searchIndexByMetric(spark, path, model, queries, k, nprobe, idCol, embCol, queryIdCol,
      scale, VectorFunctions.negInnerProduct)
  }

  /** L1 (Manhattan) search over an L2-metric index — pgvector 0.7's
    * `vector_l1_ops` / `<+>` analogue. Cells are probed by L2 geometry
    * (L1 and L2 balls are mutually bounded within √dim, so an L1 query's
    * true neighbors live in nearby-L2 cells with high probability — the
    * same probe-metric/rerank-metric split as [[searchIndexIp]]); the
    * rerank scores exact Σ|xᵢ−qᵢ|. `nprobe` is the recall knob; full
    * probe degenerates to exact L1 KNN (oracle-gated). A cosine store is
    * refused: its vectors were L2-normalized at write, so L1 over the
    * stored bytes would rank the NORMALIZED geometry while the caller
    * asked about the raw one — silent wrong answers, not approximation. */
  def searchIndexL1(spark: org.apache.spark.sql.SparkSession, path: String,
                    queries: DataFrame, k: Int, nprobe: Int,
                    idCol: String = "vec_id", embCol: String = "embedding",
                    queryIdCol: String = "qid", scale: Int = 4): DataFrame = {
    require(readMetric(spark, path) == "l2",
      s"searchIndexL1: $path is a cosine-metric (normalized) index — L1 over " +
        "normalized bytes answers a different question; build an L2 store for <+>")
    val model = readModel(spark, path)
    searchIndexByMetric(spark, path, model, queries, k, nprobe, idCol, embCol, queryIdCol,
      scale, VectorFunctions.l1Distance)
  }

  /** Append new vectors to a quantized index: cells assigned under the
    * existing centroids AND codes under the existing range — both read
    * from the sidecars, so appended rows are scan-compatible with the
    * original write. A value outside the trained [mn, mx] clamps to the
    * edge code (the SQ8 contract); heavy drift is the same rebuild
    * trigger as [[needsRebuild]]. Append-only, caller dedups ids — the
    * [[appendIndex]] contract. */
  def appendIndexQuantized(spark: org.apache.spark.sql.SparkSession, path: String,
                           vectors: DataFrame,
                           idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    recoverPending(spark, path, "appendIndexQuantized")
    val model = readModel(spark, path)
    val (mn, mx) = readQuantRange(spark, path)
    vectors.select(col(idCol), col(embCol),
        Quantize.quantizeExpr(col(embCol), mn, mx).as("qvec"),
        cellOf(col(embCol), model).as("cell"))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(path)
  }

  /** Persist an IVF-PQ index — faiss IVFPQ's on-disk shape: the
    * cell-partitioned layout of [[writeIndex]] PLUS an m-int product-code
    * column over per-cell RESIDUALS (`x − centroid(cell(x))`, see
    * [[ProductQuantizer.residualExpr]]). Two sidecars ride along:
    * `_centroids.json` (the coarse quantizer) and `_pq.json` (the
    * codebooks), so a search job — or the `IvfScanRewriteRule` planner
    * path — reconstructs both models without retraining. Train `pq` with
    * [[ProductQuantizer.trainResidual]] against the SAME `model`. */
  def writeIndexPq(corpus: DataFrame, model: Model, pq: ProductQuantizer.Model,
                   path: String,
                   idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    corpus
      .select(col(idCol), col(embCol), cellOf(col(embCol), model).as("cell"))
      .select(col(idCol), col(embCol), col("cell"),
        ProductQuantizer.encodeExpr(
          ProductQuantizer.residualExpr(col(embCol), col("cell"), model), pq).as("pq_codes"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    val json = model.centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    writeSidecar(corpus.sparkSession, path, "_centroids.json", json)
    ProductQuantizer.writeModel(corpus.sparkSession, path, pq)
  }

  /** Search a [[writeIndexPq]] store: static `cell IN` partition pruning,
    * then an ADC coarse pass reading only (id, pq_codes) — each probed
    * row is scored by `m` table lookups against the per-(query, cell)
    * RESIDUAL distance table (‖q−(c+recon)‖² = ‖(q−c)−recon‖², so the
    * ADC decomposition identity carries over; tables are
    * |queries|·nprobe·m·ksub doubles, driver-built, broadcast) — then a
    * full-precision L2 rerank of the `k·overfetch` survivors. The
    * candidate-id read carries the [[DedupIndex.searchIndex]] guard:
    * static `id IN` pushdown up to `maxPushdownIds`, left-semi join
    * fallback above it — correct at any query-frame cardinality. Output
    * `(qid, id, dist, rn)` like [[searchIndexQuantized]]. */
  def searchIndexPq(spark: org.apache.spark.sql.SparkSession, path: String,
                    queries: DataFrame, k: Int, nprobe: Int, overfetch: Int = 4,
                    idCol: String = "vec_id", embCol: String = "embedding",
                    queryIdCol: String = "qid", scale: Int = 4,
                    maxPushdownIds: Int = 100000): DataFrame = {
    import spark.implicits._
    val model = readModel(spark, path)
    val pq = ProductQuantizer.readModel(spark, path)
    // per-(query, cell) residual ADC tables — driver-local math on the
    // sidecar models over the broadcast-small query batch
    val qRows = queries
      .select(col(queryIdCol).cast("long"), col(embCol).cast("array<double>"),
        cellsOf(col(embCol), model, nprobe))
      .collect()
      .flatMap { r =>
        val qid = r.getLong(0)
        val q = r.getSeq[Double](1).toArray
        r.getSeq[Int](2).map { cell =>
          val ctr = model.centroids(cell)
          val resid = Array.tabulate(q.length)(i => q(i) - ctr(i))
          (qid, cell, ProductQuantizer.queryTable(resid, pq).toSeq)
        }
      }
    val probedCells = qRows.map(_._2).distinct.map(_.asInstanceOf[Any])
    val qTables = broadcast(qRows.toSeq.toDF(queryIdCol, "cell", "__qtab"))
    // coarse: probed partitions only, (id, pq_codes) deserialized — the
    // float column is never read here
    val coarse = spark.read.parquet(path)
      .where(col("cell").isin(probedCells: _*))
      .select(col(idCol), col("cell"), col("pq_codes"))
      .join(qTables, Seq("cell"))
      .select(col(queryIdCol), col(idCol),
        ProductQuantizer.adcScoreExpr(col("pq_codes"), col("__qtab"), pq.ksub).as("__adc"))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("__adc"), col(idCol))
    val candFrame = coarse.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k * overfetch)
      .select(col(idCol)).distinct()
      .localCheckpoint(true)
    val probe = candFrame.limit(maxPushdownIds + 1).collect()
    val rerankBase = spark.read.parquet(path)
      .where(col("cell").isin(probedCells: _*))
    val rerankDocs =
      if (probe.length <= maxPushdownIds)
        rerankBase.where(col(idCol).isin(probe.map(_.getLong(0)).toSeq: _*))
      else rerankBase.join(candFrame, Seq(idCol), "left_semi")
    val qSide = broadcast(queries.select(col(queryIdCol), col(embCol).as("__qemb")))
    val rerank = rerankDocs
      .select(col(idCol), col(embCol))
      .crossJoin(qSide)
      .select(col(queryIdCol), col(idCol),
        round(VectorFunctions.l2Distance(col(embCol), col("__qemb")), scale).as("dist"))
    val w2 = Window.partitionBy(col(queryIdCol)).orderBy(col("dist"), col(idCol))
    rerank.withColumn("rn", row_number().over(w2))
      .where(col("rn") <= k)
      .select(col(queryIdCol), col(idCol), col("dist"), col("rn").cast("long").as("rn"))
  }

  /** Append new vectors to an IVF-PQ index: cells assigned under the
    * existing centroids AND residual codes under the existing codebooks —
    * both read from the sidecars, so appended rows are scan-compatible
    * with the original write (the [[appendIndexQuantized]] contract:
    * append-only, caller dedups ids, heavy drift is a [[needsRebuild]]
    * rebuild trigger — retrain BOTH models, the codebooks quantize
    * residuals of the centroids they were trained against). */
  def appendIndexPq(spark: org.apache.spark.sql.SparkSession, path: String,
                    vectors: DataFrame,
                    idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    recoverPending(spark, path, "appendIndexPq")
    val model = readModel(spark, path)
    val pq = ProductQuantizer.readModel(spark, path)
    vectors
      .select(col(idCol), col(embCol), cellOf(col(embCol), model).as("cell"))
      .select(col(idCol), col(embCol), col("cell"),
        ProductQuantizer.encodeExpr(
          ProductQuantizer.residualExpr(col(embCol), col("cell"), model), pq).as("pq_codes"))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(path)
  }

  private def writeSidecar(spark: org.apache.spark.sql.SparkSession, path: String,
                           name: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private def readSidecar(spark: org.apache.spark.sql.SparkSession, path: String,
                          name: String): String = {
    val p = new org.apache.hadoop.fs.Path(path, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }
}
