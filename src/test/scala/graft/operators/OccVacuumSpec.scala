package graft.operators

import graft.SparkTestBase

/** Pins e30's vacuum + log truncation:
  *
  *  - deletes EXACTLY the data files retired at or below the
  *    checkpoint, and the commit files of the truncated prefix;
  *  - spares live files (the snapshot's net adds), the snapshot, and
  *    every post-checkpoint commit — including removes in the TAIL,
  *    whose victims' bytes must outlive this vacuum (a later
  *    checkpoint retires them);
  *  - the reader contract survives: bootstrap ≡ the pre-vacuum
  *    answer, AS OF ≥ checkpoint bootstraps from the snapshot, AS OF
  *    below it fails loudly as expired;
  *  - a second vacuum is a no-op (idempotence).
  */
class OccVacuumSpec extends SparkTestBase {

  private def freshRoot(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("occvac_spec_").toFile
    d.deleteOnExit()
    d
  }

  private def stage(root: java.io.File, name: String,
                    ks: Seq[Int]): String = {
    import spark.implicits._
    val d = new java.io.File(root, name)
    ks.map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.parquet(d.getAbsolutePath)
    d.getAbsolutePath
  }

  private def fr(f: String) = (f, 1L, 0L, 100L, 0L, 100L)

  private def bootKs(root: java.io.File): Seq[Int] = {
    import spark.implicits._
    val files = Lakehouse.occVisible(Lakehouse.occBootstrap(spark, root)._1)
      .select($"file").as[String].collect().toSeq.sorted
    spark.read.parquet(files: _*).select($"k").as[Int].collect().toSeq.sorted
  }

  test("vacuum deletes exactly the pre-checkpoint retired prefix; readers and the tail survive; idempotent") {
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2))
    val b = stage(root, "b", Seq(3))
    Lakehouse.occCommit(spark, root, Seq(fr(a), fr(b)), snapshotVersion = -1)
    // v1: compaction retires a+b for a packed replacement
    val packed = stage(root, "packed", Seq(1, 2, 3))
    Lakehouse.occCommit(spark, root, Seq(fr(packed)), snapshotVersion = 0,
      removes = Seq(a, b), dataChange = false)
    Lakehouse.occCheckpoint(spark, root, upTo = 1)
    // v2: post-checkpoint ingest; v3: a TAIL remove whose victim's
    // bytes this vacuum must spare (only a later checkpoint may retire
    // them)
    val c = stage(root, "c", Seq(4))
    val d = stage(root, "d", Seq(5))
    Lakehouse.occCommit(spark, root, Seq(fr(c), fr(d)), snapshotVersion = 1)
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 2,
      removes = Seq(d))
    val before = bootKs(root)
    assert(before == Seq(1, 2, 3, 4), s"pre-vacuum state wrong: $before")

    val (truncated, deleted) = Lakehouse.occVacuum(spark, root)
    assert(truncated == Seq(0, 1), s"truncated $truncated")
    assert(deleted.toSet == Set(a, b), s"deleted $deleted")
    // retired bytes gone; live + tail-removed bytes present
    assert(!new java.io.File(a).exists() && !new java.io.File(b).exists())
    assert(new java.io.File(packed).exists() &&
      new java.io.File(c).exists() && new java.io.File(d).exists(),
      "vacuum touched a live or tail-referenced file")
    // log = tail only; snapshot intact
    assert(Lakehouse.occVersions(new java.io.File(root, "commits")) == Seq(2, 3))
    // reader contract: bootstrap unchanged, AS OF >= cp works, below loud
    assert(bootKs(root) == before, "vacuum changed the answer")
    import spark.implicits._
    val atCp = Lakehouse.occAsOf(spark, root, 1)
      .select($"file").as[String].collect().toSeq
    assert(atCp == Seq(packed), s"AS OF cp wrong: $atCp")
    val at2 = Lakehouse.occAsOf(spark, root, 2)
      .select($"file").as[String].collect().toSeq.sorted
    assert(at2 == Seq(c, d, packed).sorted, s"AS OF 2 wrong: $at2")
    intercept[IllegalArgumentException] {
      Lakehouse.occAsOf(spark, root, 0)
    }
    // idempotence
    assert(Lakehouse.occVacuum(spark, root) == ((Nil, Nil)),
      "second vacuum was not a no-op")
  }

  test("re-checkpointing a truncated log folds the previous snapshot in — pre-vacuum state survives") {
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)  // v0
    Lakehouse.occCheckpoint(spark, root, upTo = 0)
    val b = stage(root, "b", Seq(3))
    Lakehouse.occCommit(spark, root, Seq(fr(b)), snapshotVersion = 0)   // v1
    Lakehouse.occVacuum(spark, root)                 // truncates v0
    val c = stage(root, "c", Seq(4))
    Lakehouse.occCommit(spark, root, Seq(fr(c)), snapshotVersion = 1)   // v2
    // round-15 self-review pin: the commits dir no longer holds v0 —
    // a snapshot rebuilt from surviving commits alone would LOSE a
    Lakehouse.occCheckpoint(spark, root, upTo = 2)
    assert(bootKs(root) == Seq(1, 2, 3, 4),
      "re-checkpoint after vacuum lost the truncated history")
    // and the tail is now empty: the snapshot alone answers
    assert(Lakehouse.occBootstrap(spark, root)._2.isEmpty)
  }

  private def keysFile(root: java.io.File, name: String,
                       ks: Seq[Int]): String = {
    import spark.implicits._
    val d = new java.io.File(root, name)
    ks.toDF("k").coalesce(1).write.parquet(d.getAbsolutePath)
    d.getAbsolutePath
  }

  private def sidecarFor(root: java.io.File, a: String, name: String,
                         ks: Seq[Int]): String = {
    import spark.implicits._
    val d = new java.io.File(root, name)
    spark.read.parquet(a)
      .select(org.apache.spark.sql.functions.col("_metadata.file_path")
        .as("file"),
        org.apache.spark.sql.functions.col("_metadata.row_index")
          .as("pos"), $"k")
      .filter($"k".isin(ks: _*)).select($"file", $"pos")
      .coalesce(1).write.parquet(d.getAbsolutePath)
    d.getAbsolutePath
  }

  test("e33: all four batch scans and the change feed agree row-for-row across a vacuum; maintenance resolves snapshot-only victims") {
    import spark.implicits._
    // mixed log: a(1..4) @v0; dv masks 3 @v1; eqdel {1} @v2; cp @v2;
    // b(5,6) @v3 — then vacuum truncates v0–v2
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2, 3, 4))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
      dvs = Seq((a, sidecarFor(root, a, "dv1", Seq(3)))))
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 1,
      eqDeletes = Seq(keysFile(root, "d1", Seq(1))))
    Lakehouse.occCheckpoint(spark, root, upTo = 2)
    val b = stage(root, "b", Seq(5, 6))
    Lakehouse.occCommit(spark, root, Seq(fr(b)), snapshotVersion = 2)
    def ks(df: org.apache.spark.sql.DataFrame): Seq[Int] =
      df.select($"k").as[Int].collect().toSeq.sorted
    val allBefore = ks(Lakehouse.occScanAll(spark, root, Seq("k")))
    val feedBefore = Lakehouse.occChangeFeed(spark, root, 2, 3)
      .select($"change_type", $"k").as[(String, Int)]
      .collect().toSeq.sorted
    assert(allBefore == Seq(2, 4, 5, 6), s"pre-vacuum scan wrong: $allBefore")

    val (truncated, _) = Lakehouse.occVacuum(spark, root)
    assert(truncated == Seq(0, 1, 2))
    // the unified scan answers identically from the snapshot
    assert(ks(Lakehouse.occScanAll(spark, root, Seq("k"))) == allBefore,
      "occScanAll changed across the vacuum")
    // the tail-window feed answers identically (context from snapshot)
    val feedAfter = Lakehouse.occChangeFeed(spark, root, 2, 3)
      .select($"change_type", $"k").as[(String, Int)]
      .collect().toSeq.sorted
    assert(feedAfter == feedBefore, "the feed changed across the vacuum")
    // a window reaching under the checkpoint expires loudly
    intercept[IllegalArgumentException] {
      Lakehouse.occChangeFeed(spark, root, 0, 3)
    }
    // single-flavor scans on single-flavor truncated logs: stage two
    // more roots, dv-only and eq-only, same shape
    locally { // dv-only
      val r = freshRoot()
      val f = stage(r, "a", Seq(1, 2, 3))
      Lakehouse.occCommit(spark, r, Seq(fr(f)), snapshotVersion = -1)
      Lakehouse.occCommit(spark, r, Nil, snapshotVersion = 0,
        dvs = Seq((f, sidecarFor(r, f, "dv1", Seq(2)))))
      Lakehouse.occCheckpoint(spark, r, upTo = 1)
      val g = stage(r, "b", Seq(4))
      Lakehouse.occCommit(spark, r, Seq(fr(g)), snapshotVersion = 1)
      val before = ks(Lakehouse.occScanVisible(spark, r))
      Lakehouse.occVacuum(spark, r)
      assert(ks(Lakehouse.occScanVisible(spark, r)) == before,
        "occScanVisible changed across the vacuum")
      // maintenance on a SNAPSHOT-ONLY dv'd victim resolves (VERDICT
      // r15 #5: was a bare NoSuchElementException path) and must not
      // resurrect the masked row
      Lakehouse.occCompact(spark, r, Seq(f), "c0",
        snapshotVersion = Lakehouse.occVersions(
          new java.io.File(r, "commits")).last,
        stats = d => Seq((d.getAbsolutePath, 0L, 0L, 100L, 0L, 100L)))
      assert(ks(Lakehouse.occScanVisible(spark, r)) == before,
        "compacting a snapshot-only victim resurrected a masked row")
    }
    locally { // eq-only
      val r = freshRoot()
      val f = stage(r, "a", Seq(1, 2, 3))
      Lakehouse.occCommit(spark, r, Seq(fr(f)), snapshotVersion = -1)
      Lakehouse.occCommit(spark, r, Nil, snapshotVersion = 0,
        eqDeletes = Seq(keysFile(r, "d1", Seq(2))))
      Lakehouse.occCheckpoint(spark, r, upTo = 1)
      val g = stage(r, "b", Seq(2, 4))
      Lakehouse.occCommit(spark, r, Seq(fr(g)), snapshotVersion = 1)
      // a loses k=2 (below the delete); b's re-inserted 2 survives
      val before = ks(Lakehouse.occScanEq(spark, r, Seq("k")))
      assert(before == Seq(1, 2, 3, 4), s"pre-vacuum eq scan wrong: $before")
      Lakehouse.occVacuum(spark, r)
      assert(ks(Lakehouse.occScanEq(spark, r, Seq("k"))) == before,
        "occScanEq changed across the vacuum")
      // eq→positional conversion on a truncated log resolves the
      // snapshot-only add and its pending delete through the snapshot
      assert(Lakehouse.occConvertEqDeletes(spark, r) == 1)
      assert(ks(Lakehouse.occScanVisible(spark, r)) == before,
        "conversion on a truncated log changed the answer")
    }
    // a victim in neither log nor snapshot is a NAMED refusal
    val miss = intercept[IllegalArgumentException] {
      Lakehouse.occCompact(spark, root, Seq("/nope/missing.parquet"), "cx",
        snapshotVersion = 3,
        stats = d => Seq((d.getAbsolutePath, 0L, 0L, 100L, 0L, 100L)))
    }
    assert(miss.getMessage.contains("not a live add"),
      s"unnamed refusal: ${miss.getMessage}")
  }

  test("e34: the retention clock truncates only the aged checkpointed prefix; in-window versions survive") {
    import spark.implicits._
    val root = freshRoot()
    val commitsDir = new java.io.File(root, "commits")
    val a = stage(root, "a", Seq(1, 2))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
    Lakehouse.occCheckpoint(spark, root, upTo = 0)
    val b = stage(root, "b", Seq(3))
    Lakehouse.occCommit(spark, root, Seq(fr(b)), snapshotVersion = 0)
    Lakehouse.occCheckpoint(spark, root, upTo = 1)
    val c = stage(root, "c", Seq(4))
    Lakehouse.occCommit(spark, root, Seq(fr(c)), snapshotVersion = 1)
    val now = System.currentTimeMillis()
    val hour = 3600L * 1000
    // v0 aged 48h, v1 aged 30h, v2 fresh; retention 24h → floor = v1
    assert(Lakehouse.occCommitFile(commitsDir, 0).setLastModified(now - 48 * hour))
    assert(Lakehouse.occCommitFile(commitsDir, 1).setLastModified(now - 30 * hour))
    val (truncated, deleted) =
      Lakehouse.occVacuum(spark, root, retainMillis = 24 * hour, now = now)
    assert(truncated == Seq(0, 1) && deleted.isEmpty,
      s"retention floor wrong: $truncated / $deleted")
    assert(Lakehouse.occCheckpointVersions(root) == Seq(1),
      "cp_v0 must expire with its versions; cp_v1 is the floor")
    // AS OF: v0 expired, v1 (floor) and v2 (in-window) answer
    intercept[IllegalArgumentException] { Lakehouse.occAsOf(spark, root, 0) }
    assert(Lakehouse.occAsOf(spark, root, 1)
      .select($"file").as[String].collect().toSeq.sorted == Seq(a, b).sorted)
    assert(Lakehouse.occAsOf(spark, root, 2)
      .select($"file").as[String].collect().toSeq.sorted ==
      Seq(a, b, c).sorted)
    assert(bootKs(root) == Seq(1, 2, 3, 4))
    // a retention window covering everything is a no-op
    assert(Lakehouse.occVacuum(spark, root,
      retainMillis = 365L * 24 * hour, now = now) == ((Nil, Nil)),
      "an all-covering retention window truncated something")
  }

  test("round-16 self-review: a writer on a fully-truncated log claims above the checkpoint, never v0") {
    // checkpoint at the HEAD, then vacuum: the commits dir is EMPTY and
    // the snapshot is the only replica — a writer deriving its version
    // from the dir alone would claim v0, making the log look complete
    // and silently shadowing the snapshot for every reader
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
    Lakehouse.occCheckpoint(spark, root, upTo = 0)
    val (truncated, _) = Lakehouse.occVacuum(spark, root)
    assert(truncated == Seq(0))
    assert(Lakehouse.occVersions(new java.io.File(root, "commits")).isEmpty,
      "head-checkpointed vacuum should empty the commits dir")
    val b = stage(root, "b", Seq(3))
    val res = Lakehouse.occCommit(spark, root, Seq(fr(b)), snapshotVersion = 0)
    assert(res.version == 1,
      s"writer claimed v${res.version} on a truncated log — v0 would " +
        "shadow the snapshot")
    assert(bootKs(root) == Seq(1, 2, 3))
  }

  test("ADVICE r16: checkpointing BETWEEN the retention floor and the pointer folds the floor snapshot and never regresses the pointer") {
    import spark.implicits._
    // cp_0, then v1/v2, cp_2; age only v0 → retention vacuum floors at
    // 0 (< pointer 2), truncating just v0. occCheckpoint(upTo = 1) then
    // sits strictly between floor and pointer: the pointer-based base
    // lookup found NO base but non-empty srcs — silently writing a
    // checkpoint missing all pre-floor history AND regressing
    // _last_checkpoint to 1, losing `a` for every later bootstrap.
    val root = freshRoot()
    val commitsDir = new java.io.File(root, "commits")
    val a = stage(root, "a", Seq(1, 2))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
    Lakehouse.occCheckpoint(spark, root, upTo = 0)
    val b = stage(root, "b", Seq(3))
    Lakehouse.occCommit(spark, root, Seq(fr(b)), snapshotVersion = 0)
    val c = stage(root, "c", Seq(4))
    Lakehouse.occCommit(spark, root, Seq(fr(c)), snapshotVersion = 1)
    Lakehouse.occCheckpoint(spark, root, upTo = 2)
    val now = System.currentTimeMillis()
    val hour = 3600L * 1000
    assert(Lakehouse.occCommitFile(commitsDir, 0)
      .setLastModified(now - 48 * hour))
    val (truncated, _) =
      Lakehouse.occVacuum(spark, root, retainMillis = 24 * hour, now = now)
    assert(truncated == Seq(0), s"floor drifted: $truncated")
    assert(Lakehouse.occCheckpointVersions(root) == Seq(0, 2))

    Lakehouse.occCheckpoint(spark, root, upTo = 1)
    // the backwards checkpoint carries the FULL history ≤ 1 (cp_0's a
    // folded in, v1 replayed) …
    val cp1 = spark.read.parquet(new java.io.File(
      new java.io.File(root, "checkpoints"), "cp_v00001.parquet")
      .getAbsolutePath)
    val cp1Files = cp1.filter($"action" === "add")
      .select($"file").as[String].collect().toSeq.sorted
    assert(cp1Files == Seq(a, b).sorted,
      s"backwards checkpoint lost pre-floor history: $cp1Files")
    // … and the pointer did NOT regress: bootstrap still serves a,b,c
    assert(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(root, "_last_checkpoint").toPath)).trim.toInt == 2,
      "a backwards checkpoint regressed _last_checkpoint")
    assert(bootKs(root) == Seq(1, 2, 3, 4))
    // a checkpoint below every retained base refuses loudly once the
    // floor has truncated the history it would need
    Seq(0).foreach { v =>
      java.nio.file.Files.delete(new java.io.File(
        new java.io.File(root, "checkpoints"), f"cp_v$v%05d.parquet").toPath)
    }
    val e = intercept[IllegalArgumentException] {
      Lakehouse.occCheckpoint(spark, root, upTo = 0)
    }
    assert(e.getMessage.contains("truncated history"),
      s"unnamed refusal: ${e.getMessage}")
  }

  test("ADVICE r16: a CDF window starting at the retention floor replays from retained raw commits; under the floor expires") {
    import spark.implicits._
    // floor 0 < pointer 1 with v1/v2 retained: the (0, 2] window is
    // fully reconstructible — in-window actions from raw commits,
    // netting context from cp_0 — and must answer identically across
    // the vacuum (the pointer-based bound refused it).
    val root = freshRoot()
    val commitsDir = new java.io.File(root, "commits")
    val a = stage(root, "a", Seq(1, 2))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
    Lakehouse.occCheckpoint(spark, root, upTo = 0)
    val b = stage(root, "b", Seq(3))
    Lakehouse.occCommit(spark, root, Seq(fr(b)), snapshotVersion = 0)
    Lakehouse.occCheckpoint(spark, root, upTo = 1)
    val c = stage(root, "c", Seq(4))
    Lakehouse.occCommit(spark, root, Seq(fr(c)), snapshotVersion = 1)
    def feed(from: Int, to: Int): Seq[(String, Int)] =
      Lakehouse.occChangeFeed(spark, root, from, to)
        .select($"change_type", $"k").as[(String, Int)]
        .collect().toSeq.sorted
    val before = feed(0, 2)
    assert(before == Seq(("insert", 3), ("insert", 4)), s"pre: $before")
    val now = System.currentTimeMillis()
    val hour = 3600L * 1000
    assert(Lakehouse.occCommitFile(commitsDir, 0)
      .setLastModified(now - 48 * hour))
    val (truncated, _) =
      Lakehouse.occVacuum(spark, root, retainMillis = 24 * hour, now = now)
    assert(truncated == Seq(0))
    assert(feed(0, 2) == before,
      "the floor-window feed diverged across the retention vacuum")
    // reaching under the floor: v0's per-version images expired
    intercept[IllegalArgumentException] {
      Lakehouse.occChangeFeed(spark, root, -1, 2)
    }
    // the raw-commit window readers refuse the same reach (VERDICT r16
    // #5 — they silently dropped vacuumed versions before)
    val e1 = intercept[IllegalArgumentException] {
      Lakehouse.occChangedFiles(spark, root, -1, 2)
    }
    assert(e1.getMessage.contains("expired"), s"unnamed: ${e1.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      Lakehouse.occChangedDvs(spark, root, -1, 2)
    }
    assert(e2.getMessage.contains("expired"), s"unnamed: ${e2.getMessage}")
    // at-or-above the floor the raw readers still answer
    assert(Lakehouse.occChangedFiles(spark, root, 0, 2)._1.sorted ==
      Seq(b, c).sorted)
  }

  test("round-16 self-review: re-checkpointing a retention-vacuumed log does not double-count commits under the pointer") {
    import spark.implicits._
    // floor BELOW the pointer: cp_0 and cp_1 exist, only v0 is aged —
    // the retention vacuum truncates v0 alone, ptr stays at 1, and v1
    // remains BOTH on disk and inside cp_1. A re-checkpoint that folds
    // cp_1 in and re-reads v1 raw would duplicate v1's add rows.
    val root = freshRoot()
    val commitsDir = new java.io.File(root, "commits")
    val a = stage(root, "a", Seq(1, 2))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
    Lakehouse.occCheckpoint(spark, root, upTo = 0)
    val b = stage(root, "b", Seq(3))
    Lakehouse.occCommit(spark, root, Seq(fr(b)), snapshotVersion = 0)
    Lakehouse.occCheckpoint(spark, root, upTo = 1)
    val now = System.currentTimeMillis()
    val hour = 3600L * 1000
    assert(Lakehouse.occCommitFile(commitsDir, 0)
      .setLastModified(now - 48 * hour))
    val (truncated, _) =
      Lakehouse.occVacuum(spark, root, retainMillis = 24 * hour, now = now)
    assert(truncated == Seq(0), s"floor drifted: $truncated")
    val c = stage(root, "c", Seq(4))
    Lakehouse.occCommit(spark, root, Seq(fr(c)), snapshotVersion = 1)
    Lakehouse.occCheckpoint(spark, root, upTo = 2)
    // one add row per file in the fresh snapshot, and the answer exact
    val cp = spark.read.parquet(new java.io.File(
      new java.io.File(root, "checkpoints"), "cp_v00002.parquet")
      .getAbsolutePath)
    val dup = cp.filter($"action" === "add")
      .groupBy($"file").count().filter($"count" > 1).count()
    assert(dup == 0, "re-checkpoint duplicated add rows under the pointer")
    assert(bootKs(root) == Seq(1, 2, 3, 4),
      "re-checkpoint after a retention vacuum lost or duplicated rows")
  }
}
