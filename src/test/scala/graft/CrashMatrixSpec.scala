package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Hnsw, IvfIndex, SparseKnn}

/** Systematic crash KILL-POINT MATRIX (VERDICT r11 task 4): every
  * maintenance protocol's intermediate state is fabricated from the
  * protocol definition itself — not hand-picked per past bug — and
  * recovery must land on a state equal to either never-started or
  * fully-applied, with a re-run converging to fully-applied.
  *
  * Families × ops × kill points:
  *  - IVF StagedSwap (delete / upsert / reassign): {post-staging,
  *    post-manifest, mid-install, pre-cleanup} — the manifest is the
  *    commit point, so post-staging rolls BACK (store untouched) and
  *    every later point rolls FORWARD deterministically.
  *  - sparse whole-dir swap (compact / upsert): {staging-partial,
  *    staging-complete, mid-swap (live retired, staging not promoted),
  *    post-promote (retired not cleaned)} — one rename is the commit
  *    point; states before it heal to OLD, after it to NEW, and the
  *    re-run converges.
  *  - HNSW tombstone AtomicDir (delete): {tmp leftover, retired-only
  *    (live missing), retired+live} — readable() never loses the set.
  *
  * 4×3 + 4×2 + 3 = 23 states. Kill-point fabrication copies a pristine
  * store, computes the op's true post-state on a scratch copy, and
  * assembles the interrupted layout from the protocol's own dir names.
  */
class CrashMatrixSpec extends SparkSpec {

  private lazy val fs = new Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def emb() = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))

  private def copyDir(src: String, dst: String): Unit = {
    fs.delete(new Path(dst), true)
    org.apache.hadoop.fs.FileUtil.copy(fs, new Path(src), fs, new Path(dst),
      false, spark.sparkContext.hadoopConfiguration)
  }

  /** Store content as a comparable value: id -> (cell, rounded vector). */
  private def content(path: String): Map[Long, (Int, Seq[Double])] =
    spark.read.parquet(path)
      .select(col("vec_id"), col("cell"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getSeq[Double](2).map(v => math.rint(v * 1e9) / 1e9)))
      .toMap

  // ---------------------------------------------------------------- IVF

  /** Fabricate one StagedSwap kill state at `path` (a copy of the
    * pristine store) from the op's post-state, then recover via a no-op
    * maintenance call and check the protocol's promise. */
  private def ivfKillPoint(kill: String, pristine: String, post: String,
                           sidecarJson: Option[String])(rerun: String => Unit): Unit = {
    val path = Files.createTempDirectory(s"cm_ivf_$kill").toString
    copyDir(pristine, path)
    val postDf = spark.read.parquet(post)
    val origCells = spark.read.parquet(pristine).select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    val postByCell = postDf.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSet
    val orig = content(pristine)
    val want = content(post)
    // changed = any cell whose content differs between pristine and post
    val changed = (origCells ++ postByCell).filter { c =>
      orig.filter(_._2._1 == c) != want.filter(_._2._1 == c)
    }
    assert(changed.nonEmpty, s"$kill: op changed nothing — weak fixture")
    val rewrite = changed.intersect(postByCell).toSeq.sorted
    val drain = (changed -- postByCell).toSeq.sorted
    val staging = new Path(path + "__maint_staging")
    val retired = new Path(path + "__maint_retired")
    rewrite.foreach { c =>
      postDf.where(col("cell") === c).drop("cell")
        .coalesce(1).write.parquet(s"$staging/cell=$c")
    }
    def writePlan(): Unit = {
      val sidecarField = sidecarJson.fold("")(j => s""","sidecar":"$j"""")
      val out = fs.create(new Path(staging, "_plan.json"), true)
      out.write(
        s"""{"rewrite":[${rewrite.mkString(",")}],"drain":[${drain.mkString(",")}]$sidecarField}"""
          .getBytes("UTF-8"))
      out.close()
    }
    def install(c: Int): Unit = {
      fs.mkdirs(retired)
      val dest = new Path(path, s"cell=$c")
      if (fs.exists(dest)) assert(fs.rename(dest, new Path(retired, s"cell=$c")))
      assert(fs.rename(new Path(staging, s"cell=$c"), dest))
    }
    kill match {
      case "post-staging" => // no manifest: the commit point was never reached
      case "post-manifest" => writePlan()
      case "mid-install" => writePlan(); install(rewrite.head)
      case "pre-cleanup" =>
        writePlan()
        rewrite.foreach(install)
        drain.foreach { c =>
          fs.mkdirs(retired)
          val dest = new Path(path, s"cell=$c")
          if (fs.exists(dest)) assert(fs.rename(dest, new Path(retired, s"cell=$c")))
        }
    }
    // recovery rides the next maintenance call (no-op delete)
    import spark.implicits._
    IvfIndex.deleteFromIndex(spark, path, Seq.empty[Long].toDF("vec_id"))
    assert(!fs.exists(staging) && !fs.exists(retired), s"$kill: leftover swap dirs")
    val healed = content(path)
    if (kill == "post-staging")
      assert(healed == orig, s"$kill: pre-commit crash must leave the store untouched")
    else {
      assert(healed == want, s"$kill: post-commit crash must roll FORWARD")
      sidecarJson.foreach { j =>
        val m = IvfIndex.readModel(spark, path)
        val jNow = m.centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
        assert(jNow == j, s"$kill: manifest sidecar not restored")
      }
    }
    // the op re-run converges to fully-applied regardless of kill point
    rerun(path)
    assert(content(path) == want, s"$kill: re-run did not converge")
  }

  test("IVF kill-point matrix: delete / upsert / reassign × 4 protocol states") {
    val e = emb()
    val model = IvfIndex.train(e, k = 6, iters = 2)
    val pristine = Files.createTempDirectory("cm_ivf_base").toString
    IvfIndex.writeIndex(e, model, pristine)

    import spark.implicits._
    val delIds = e.where(col("vec_id") % 5 === 0).select(col("vec_id"))
    def upsBatch = e.where(col("vec_id").between(100L, 105L))
      .select((col("vec_id") - 100L).as("vec_id"), col("embedding"))
    val newModel = IvfIndex.train(e.where(col("vec_id") % 2 === 0), k = 6, iters = 2)
    val newModelJson = newModel.centroids
      .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

    val ops: Seq[(String, Option[String], String => Unit)] = Seq(
      ("delete", None,
        (p: String) => { IvfIndex.deleteFromIndex(spark, p, delIds); () }),
      ("upsert", None,
        (p: String) => { IvfIndex.upsertIndex(spark, p, upsBatch); () }),
      ("reassign", Some(newModelJson),
        (p: String) => { IvfIndex.reassignIndex(spark, p, newModel); () }))

    ops.foreach { case (opName, sidecar, run) =>
      // the op's TRUE post-state, computed on an isolated scratch copy
      val scratch = Files.createTempDirectory(s"cm_ivf_post_$opName").toString
      copyDir(pristine, scratch)
      run(scratch)
      for (kill <- Seq("post-staging", "post-manifest", "mid-install", "pre-cleanup"))
        ivfKillPoint(kill, pristine, scratch, sidecar)(run)
    }
  }

  // ------------------------------------------------------------- sparse

  /** Postings-table content: (id, norm, term, value) multiset. */
  private def tableContent(table: String): Set[(Long, Double, Long, Double)] =
    spark.table(table).collect()
      .map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e9) / 1e9,
        r.getLong(2), math.rint(r.getDouble(3) * 1e9) / 1e9)).toSet

  test("sparse kill-point matrix: compact / upsert × 4 whole-dir-swap states") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val sv = SparseKnn.hashingTf(docs, dim = 128)
    def upsBatch = SparseKnn.hashingTf(
      docs.where(col("doc_id") < 3)
        .select(col("doc_id"), concat(col("text"), lit(" crashmatrix")).as("text")),
      dim = 128)

    val ops: Seq[(String, String => Unit)] = Seq(
      ("compact", t => { SparseKnn.compactIndex(spark, t); () }),
      ("upsert", t => SparseKnn.upsertIndex(spark, upsBatch, t)))

    ops.foreach { case (opName, run) =>
      // never-crashed reference
      val refTmp = Files.createTempDirectory(s"cm_sp_ref_$opName").toString
      SparseKnn.writeIndex(sv, s"cm_sp_ref_$opName", s"$refTmp/idx", numBuckets = 4)
      run(s"cm_sp_ref_$opName")
      val want = tableContent(s"cm_sp_ref_$opName")

      for (kill <- Seq("staging-partial", "staging-complete", "mid-swap", "post-promote")) {
        val t = s"cm_sp_${opName}_${kill.replace("-", "_")}"
        val tmp = Files.createTempDirectory(t).toString
        spark.sql(s"DROP TABLE IF EXISTS `$t`")
        SparseKnn.writeIndex(sv, t, s"$tmp/idx", numBuckets = 4)
        val loc = new Path(spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(t)).location)
        val staging = new Path(loc.toString + "__compact_staging")
        val retired = new Path(loc.toString + "__compact_retired")
        kill match {
          case "staging-partial" =>
            fs.mkdirs(staging)
            val out = fs.create(new Path(staging, "part-torn.parquet"), true)
            out.write(Array[Byte](9, 9, 9)); out.close()
          case "staging-complete" =>
            // a full staged copy that never reached the commit rename
            copyDir(loc.toString, staging.toString)
          case "mid-swap" =>
            // live renamed away, staging (holding the NEW content — here
            // approximated by the old files, content-irrelevant for the
            // heal path) not yet promoted
            copyDir(loc.toString, staging.toString)
            assert(fs.rename(loc, retired))
          case "post-promote" =>
            // new content live (same files here), old copy not cleaned
            copyDir(loc.toString, retired.toString)
        }
        // the op itself heals the state, then applies
        run(t)
        assert(!fs.exists(staging) && !fs.exists(retired), s"$opName/$kill: leftover dirs")
        assert(tableContent(t) == want, s"$opName/$kill: healed+applied != never-crashed")
        spark.sql(s"DROP TABLE IF EXISTS `$t`")
        spark.sql(s"DROP TABLE IF EXISTS `${t}__compact_staging`")
      }
      spark.sql(s"DROP TABLE IF EXISTS `cm_sp_ref_$opName`")
    }
  }

  // --------------------------------------------------------------- HNSW

  test("HNSW tombstone AtomicDir matrix: tmp leftover / retired-only / retired+live") {
    import spark.implicits._
    val e = emb()
    val pristine = Files.createTempDirectory("cm_hnsw_base").toString
    Hnsw.writeIndexSharded(e, numShards = 2, pristine, m = 8, efConstruction = 32)
    Hnsw.deleteFromIndexSharded(spark, pristine, Seq(3L, 7L).toDF("vec_id"))
    def surviving(path: String): Set[Long] =
      Hnsw.searchIndexSharded(spark, path,
          e.where(col("vec_id").isin(3L, 7L, 11L))
            .select(col("vec_id").as("qid"), col("embedding")), k = 1, ef = 1024)
        .collect().map(_.getLong(1)).toSet
    val want = surviving(pristine) // 3 and 7 invisible, 11 serves itself
    assert(want == Set(11L) ++ (want - 11L), want.toString)
    assert(!want.contains(3L) && !want.contains(7L))

    for (kill <- Seq("tmp-leftover", "retired-only", "retired-and-live")) {
      val path = Files.createTempDirectory(s"cm_hnsw_$kill").toString
      copyDir(pristine, path)
      val ts = new Path(path, "_tombstones")
      kill match {
        case "tmp-leftover" =>
          // a torn replace: half-written __new beside the live set
          fs.mkdirs(new Path(path, "_tombstones__new"))
          val out = fs.create(new Path(path, "_tombstones__new/part-torn.parquet"), true)
          out.write(Array[Byte](1)); out.close()
        case "retired-only" =>
          // crash between retire and install: live missing entirely
          assert(fs.rename(ts, new Path(path, "_tombstones__old")))
        case "retired-and-live" =>
          // crash after install, before cleanup: both copies present
          copyDir(ts.toString, path + "/_tombstones__old")
      }
      // a reader in this state never loses the set…
      assert(surviving(path) == want, s"$kill: reader observed a wrong tombstone set")
      // …and the next delete heals the dirs and stays correct
      Hnsw.deleteFromIndexSharded(spark, path, Seq(3L).toDF("vec_id")) // idempotent re-delete
      assert(!fs.exists(new Path(path, "_tombstones__new")) &&
        !fs.exists(new Path(path, "_tombstones__old")), s"$kill: leftover AtomicDir state")
      assert(surviving(path) == want, s"$kill: healed store diverged")
    }
  }

  test("HNSW routed upsert kill-point matrix: 4 StagedSwap protocol states") {
    import spark.implicits._
    val e = emb()
    val pristine = Files.createTempDirectory("cm_hnswups_base").toString
    Hnsw.writeIndexRouted(e, numShards = 3, pristine, m = 8, efConstruction = 32)
    // in-distribution donor vectors (ids 0-5 take 300-305's embeddings):
    // different nearest centroids, so ids MOVE shards — the routed case
    // whose old dynamic-overwrite sequencing had the doubled-id window
    def batch = e.where(col("vec_id").between(300L, 305L))
      .select((col("vec_id") - 300L).as("vec_id"), col("embedding"))
    def run(p: String): Unit = Hnsw.upsertIndexSharded(spark, p, batch)
    /** Graph-store content as a comparable value: shard -> (n, md5). The
      * rebuild is byte-deterministic (ascending-id insertion), so the
      * healed store must equal the uninterrupted op's output exactly. */
    def gcontent(p: String): Map[Int, (Long, String)] = spark.read.parquet(p)
      .select(col("shard"), col("n"), md5(col("graph")).as("h"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getString(2))).toMap

    val scratch = Files.createTempDirectory("cm_hnswups_post").toString
    copyDir(pristine, scratch)
    run(scratch)
    val orig = gcontent(pristine)
    val want = gcontent(scratch)
    val changed = (orig.keySet ++ want.keySet).filter(sh => orig.get(sh) != want.get(sh))
    assert(changed.nonEmpty, "weak fixture: upsert changed no shard")
    val rewrite = changed.intersect(want.keySet).toSeq.sorted
    val drain = (changed -- want.keySet).toSeq.sorted

    for (kill <- Seq("post-staging", "post-manifest", "mid-install", "pre-cleanup")) {
      val path = Files.createTempDirectory(s"cm_hnswups_$kill").toString
      copyDir(pristine, path)
      val staging = new Path(path + "__maint_staging")
      val retired = new Path(path + "__maint_retired")
      val postDf = spark.read.parquet(scratch)
      rewrite.foreach { sh =>
        postDf.where(col("shard") === sh).drop("shard")
          .coalesce(1).write.parquet(s"$staging/shard=$sh")
      }
      def writePlan(): Unit = {
        val out = fs.create(new Path(staging, "_plan.json"), true)
        out.write(
          s"""{"rewrite":[${rewrite.mkString(",")}],"drain":[${drain.mkString(",")}]}"""
            .getBytes("UTF-8"))
        out.close()
      }
      def install(sh: Int): Unit = {
        fs.mkdirs(retired)
        val dest = new Path(path, s"shard=$sh")
        if (fs.exists(dest)) assert(fs.rename(dest, new Path(retired, s"shard=$sh")))
        assert(fs.rename(new Path(staging, s"shard=$sh"), dest))
      }
      kill match {
        case "post-staging" => // no manifest: commit point never reached
        case "post-manifest" => writePlan()
        case "mid-install" => writePlan(); install(rewrite.head)
        case "pre-cleanup" =>
          writePlan()
          rewrite.foreach(install)
          drain.foreach { sh =>
            fs.mkdirs(retired)
            val dest = new Path(path, s"shard=$sh")
            if (fs.exists(dest)) assert(fs.rename(dest, new Path(retired, s"shard=$sh")))
          }
      }
      // recovery rides the next maintenance call (a no-op empty upsert)
      Hnsw.upsertIndexSharded(spark, path,
        Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding"))
      assert(!fs.exists(staging) && !fs.exists(retired), s"$kill: leftover swap dirs")
      val healed = gcontent(path)
      if (kill == "post-staging")
        assert(healed == orig, s"$kill: pre-commit crash must leave the store untouched")
      else assert(healed == want, s"$kill: post-commit crash must roll FORWARD")
      // the op re-run converges to fully-applied regardless of kill point
      run(path)
      assert(gcontent(path) == want, s"$kill: re-run did not converge")
    }
  }
}
