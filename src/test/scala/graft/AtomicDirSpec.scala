package graft

import java.nio.file.Files
import graft.sources.AtomicDir

/** The crash states AtomicDir exists to survive, fabricated by hand:
  * every rename-crash point of replace() must leave the set readable
  * (live or retired) and recover() must converge to exactly one live
  * copy. */
class AtomicDirSpec extends SparkSpec {

  private def fsFor(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mkdir(p: String): org.apache.hadoop.fs.Path = {
    val hp = new org.apache.hadoop.fs.Path(p)
    fsFor(hp).mkdirs(hp); hp
  }
  private def touch(dir: org.apache.hadoop.fs.Path, name: String, body: String): Unit = {
    val fs = fsFor(dir)
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }
  private def read(dir: org.apache.hadoop.fs.Path, name: String): String = {
    val fs = fsFor(dir)
    val in = fs.open(new org.apache.hadoop.fs.Path(dir, name))
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  test("crash between retire and install: readable falls back to retired; recover restores") {
    val root = Files.createTempDirectory("atomicdir").toString
    val target = new org.apache.hadoop.fs.Path(s"$root/set")
    val fs = fsFor(target)
    // fabricated state: live missing, retired holds the only copy, a
    // complete temp waits uninstalled
    val old = mkdir(s"$root/set__old"); touch(old, "data", "v1")
    val tmp = mkdir(s"$root/set__new"); touch(tmp, "data", "v2")
    assert(AtomicDir.readable(fs, target).exists(_.getName == "set__old"))
    assert(AtomicDir.readRetrying(fs, target)(d => read(d, "data")).contains("v1"))
    // recover: the retired copy is restored (v2 was never committed —
    // the manifest-less temp is dropped, the rollback semantics)
    AtomicDir.recover(fs, target)
    assert(fs.exists(target) && read(target, "data") == "v1")
    assert(!fs.exists(old) && !fs.exists(tmp))
  }

  test("crash after install before cleanup: live wins, leftovers dropped") {
    val root = Files.createTempDirectory("atomicdir2").toString
    val target = mkdir(s"$root/set"); touch(target, "data", "v2")
    val fs = fsFor(target)
    mkdir(s"$root/set__old")
    touch(new org.apache.hadoop.fs.Path(s"$root/set__old"), "data", "v1")
    assert(AtomicDir.readable(fs, target).exists(_.getName == "set"))
    AtomicDir.recover(fs, target)
    assert(read(target, "data") == "v2")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/set__old")))
  }

  test("replace round-trip: new content installed, no leftovers, old set survives a writer crash-before-swap") {
    val root = Files.createTempDirectory("atomicdir3").toString
    val target = new org.apache.hadoop.fs.Path(s"$root/set")
    val fs = fsFor(target)
    AtomicDir.replace(fs, target)(d => { fsFor(d).mkdirs(d); touch(d, "data", "v1") })
    assert(read(target, "data") == "v1")
    AtomicDir.replace(fs, target)(d => { fsFor(d).mkdirs(d); touch(d, "data", "v2") })
    assert(read(target, "data") == "v2")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/set__old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/set__new")))
    // a writer that crashes INSIDE its write leaves the live set intact
    intercept[RuntimeException](AtomicDir.replace(fs, target) { d =>
      fsFor(d).mkdirs(d); touch(d, "data", "partial")
      throw new RuntimeException("writer crash")
    })
    assert(read(target, "data") == "v2")
    // and the next replace recovers the stale temp before proceeding
    AtomicDir.replace(fs, target)(d => { fsFor(d).mkdirs(d); touch(d, "data", "v3") })
    assert(read(target, "data") == "v3")
  }
}
