package graft.operators

import graft.SparkTestBase
import java.util.concurrent.{ConcurrentLinkedQueue, CyclicBarrier, TimeUnit}

/** Pins e17/e19's optimistic-concurrency commit protocol:
  *
  *  - claim atomicity under a genuine multi-writer race (a 4-writer
  *    barrier forces every writer onto the SAME slot; exactly one wins
  *    it, the rest retry to contiguous versions, and the union of all
  *    adds survives — lost-update impossibility, pinned structurally
  *    here and by value through e17's base-table oracle),
  *  - conflict detection (two writers adding the SAME file: the loser
  *    must abort with ConcurrentModificationException, never
  *    double-commit),
  *  - torn-commit invisibility (the log only ever contains fully-linked
  *    v*.parquet files; temp state is cleaned even on abort),
  *  - checkpoint bootstrap (e19): snapshot + tail plans the identical
  *    file set as a full-log replay while opening only 1 + |tail|
  *    manifests.
  */
class OccCommitSpec extends SparkTestBase {

  private def freshRoot(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("occ_spec_").toFile
    d.deleteOnExit()
    d
  }

  private def row(name: String): (String, Long, Long, Long, Long, Long) =
    (name, 10L, 0L, 100L, 0L, 100L)

  test("four barrier-gated writers race one slot: contiguous versions, no lost update, three retries") {
    val root = freshRoot()
    Mixing.occCommit(spark, root, Seq(row("bootstrap")), snapshotVersion = -1)
    val writers = 4
    val barrier = new CyclicBarrier(writers)
    def gate(attempt: Int): Unit =
      if (attempt == 0) { barrier.await(30, TimeUnit.SECONDS); () }
    val results = new ConcurrentLinkedQueue[Mixing.OccResult]()
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to writers).map { i =>
      new Thread(() =>
        try results.add(Mixing.occCommit(spark, root,
          Seq(row(s"writer$i-a"), row(s"writer$i-b")),
          snapshotVersion = 0, gate))
        catch { case t: Throwable => failures.add(t); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(failures.isEmpty, s"a disjoint-adds writer failed: ${failures.peek()}")

    import scala.jdk.CollectionConverters._
    val rs = results.asScala.toSeq
    assert(rs.map(_.version).sorted == (1 to writers),
      s"versions not contiguous: ${rs.map(_.version).sorted}")
    // all four claimed slot 1 together; the three losers each retried
    assert(rs.map(_.retries).sum >= writers - 1,
      s"the barrier should force >= ${writers - 1} retries, saw ${rs.map(_.retries)}")

    val commitsDir = new java.io.File(root, "commits")
    val committed = spark.read.parquet(commitsDir.getAbsolutePath)
      .select("file").collect().map(_.getString(0)).toSet
    val expected = Set("bootstrap") ++
      (1 to writers).flatMap(i => Seq(s"writer$i-a", s"writer$i-b"))
    assert(committed == expected, "a concurrent commit's adds were lost")
    // torn-commit invisibility: only fully-claimed version files live in
    // the log dir, and no temp residue survives under the root
    val names = commitsDir.listFiles().map(_.getName).toSeq
    assert(names.forall(_.matches("v\\d{5}\\.parquet")), names.toString)
    assert(!root.listFiles().exists(_.getName.startsWith("_occ_tmp_")),
      "temp commit state leaked")
  }

  test("adding a file another post-snapshot commit already added aborts, never double-commits") {
    val root = freshRoot()
    Mixing.occCommit(spark, root, Seq(row("base")), snapshotVersion = -1)
    Mixing.occCommit(spark, root, Seq(row("shared"), row("a-only")),
      snapshotVersion = 0)
    val before = Mixing.occVersions(new java.io.File(root, "commits"))
    intercept[java.util.ConcurrentModificationException] {
      Mixing.occCommit(spark, root, Seq(row("shared"), row("b-only")),
        snapshotVersion = 0)
    }
    val after = Mixing.occVersions(new java.io.File(root, "commits"))
    assert(after == before, "an aborted commit left a version in the log")
    assert(!root.listFiles().exists(_.getName.startsWith("_occ_tmp_")),
      "aborted commit leaked temp state")
    // the same adds re-tried from a FRESH snapshot (which sees the
    // winner) must also abort — the conflict is real, not a race artifact
    intercept[java.util.ConcurrentModificationException] {
      Mixing.occCommit(spark, root, Seq(row("shared")),
        snapshotVersion = 0)
    }
  }

  test("a commit racing a conflict it has NOT seen aborts on retry, not after claiming") {
    // writer snapshot = 1 (it has seen v0+v1); a v2 lands with file X
    // before the writer claims; the writer (also adding X) must detect
    // it during the claim loop
    val root = freshRoot()
    Mixing.occCommit(spark, root, Seq(row("base")), snapshotVersion = -1)
    Mixing.occCommit(spark, root, Seq(row("day1")), snapshotVersion = 0)
    Mixing.occCommit(spark, root, Seq(row("x")), snapshotVersion = 1) // v2
    intercept[java.util.ConcurrentModificationException] {
      Mixing.occCommit(spark, root, Seq(row("x")), snapshotVersion = 1)
    }
  }

  test("e19 bootstrap: snapshot + tail equals full replay, opening only 1 + |tail| manifests") {
    val root = new java.io.File(Mixing.occRoot(spark, sfDir))
    val commitsDir = new java.io.File(root, "commits")
    assert(Mixing.occVersions(commitsDir) == Seq(0, 1, 2, 3, 4),
      "staged OCC log should carry 5 commits")
    val cpV = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(root, "_last_checkpoint").toPath)).trim.toInt
    assert(cpV == 2, s"checkpoint pointer should read v2, got v$cpV")

    val (frame, tail) = Mixing.occBootstrap(spark, root)
    assert(tail == Seq(3, 4),
      s"bootstrap should replay exactly the post-checkpoint commits, got $tail")
    val viaBootstrap = frame
      .select("file").collect().map(_.getString(0)).toSet
    val viaFullReplay = spark.read.parquet(commitsDir.getAbsolutePath)
      .select("file").collect().map(_.getString(0)).toSet
    assert(viaBootstrap == viaFullReplay,
      "snapshot+tail diverged from replaying the full commit log")
    // the physical bootstrap read set: one checkpoint + the two tail
    // commits — never the five log files
    val opened = frame.inputFiles.toSeq.sorted
    assert(opened.size == 1 + tail.size,
      s"bootstrap opened ${opened.size} manifests: $opened")
    assert(opened.exists(_.contains("cp_v00002")), opened.toString)
  }
}
