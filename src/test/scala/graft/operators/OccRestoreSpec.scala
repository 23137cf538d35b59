package graft.operators

import graft.SparkTestBase

/** Pins e36's RESTORE VERSION AS OF:
  *
  *  - the restore is ONE metadata commit: re-adds files visible at the
  *    target but not now, removes files visible now but not then, and
  *    the re-added rows answer exactly the target version's state;
  *  - CDC sees the rollback (dataChange=true): resurrected rows as
  *    inserts, rolled-back rows as deletes — Delta RESTORE's CDF
  *    contract;
  *  - a restore BELOW the vacuum floor refuses loudly (the AS-OF
  *    expiry), at-or-above the floor works on a truncated log;
  *  - a log carrying LIVE row-level deletes refuses loudly
  *    (file-granularity restore would mis-scope the masks); a RETIRED
  *    delete file does not block;
  *  - restoring to the current state is a no-op (idempotence).
  */
class OccRestoreSpec extends SparkTestBase {

  private def freshRoot(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("occrestore_spec_").toFile
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

  private def ks(root: java.io.File): Seq[Int] = {
    import spark.implicits._
    Lakehouse.occScanVisible(spark, root)
      .select($"k").as[Int].collect().toSeq.sorted
  }

  test("restore re-adds the rolled-back files, feeds CDC as inserts+deletes, and is idempotent") {
    import spark.implicits._
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
    val b = stage(root, "b", Seq(3, 4))
    Lakehouse.occCommit(spark, root, Seq(fr(b)), snapshotVersion = 0)
    // v2: a "bad ingest" lands c and removes b (a faulty rewrite)
    val c = stage(root, "c", Seq(9))
    Lakehouse.occCommit(spark, root, Seq(fr(c)), snapshotVersion = 1,
      removes = Seq(b))
    assert(ks(root) == Seq(1, 2, 9))

    val res = Lakehouse.occRestore(spark, root, 1)
    assert(res.exists(_.version == 3), s"restore commit wrong: $res")
    assert(ks(root) == Seq(1, 2, 3, 4), "restore did not recover v1's state")
    // CDC window (2,3]: b's rows return as inserts, c's leave as deletes
    val feed = Lakehouse.occChangeFeed(spark, root, 2, 3)
      .select($"change_type", $"k").as[(String, Int)]
      .collect().toSeq.sorted
    assert(feed == Seq(("delete", 9), ("insert", 3), ("insert", 4)),
      s"restore CDF images wrong: $feed")
    // idempotence: target == current → no commit
    assert(Lakehouse.occRestore(spark, root, 3).isEmpty)
    assert(Lakehouse.occVersions(new java.io.File(root, "commits")) ==
      Seq(0, 1, 2, 3))
  }

  test("restore composes with the vacuum floor: at-or-above works on a truncated log, below refuses as expired") {
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
    val b = stage(root, "b", Seq(3))
    Lakehouse.occCommit(spark, root, Seq(fr(b)), snapshotVersion = 0)
    Lakehouse.occCheckpoint(spark, root, upTo = 1)
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 1,
      removes = Seq(b))                                   // v2: revert b
    Lakehouse.occVacuum(spark, root)                      // truncate v0-v1
    assert(ks(root) == Seq(1, 2))
    // restore to the floor version: b's bytes survived (retired in the
    // TAIL, which the vacuum spares) and the snapshot carries its stats
    val res = Lakehouse.occRestore(spark, root, 1)
    assert(res.isDefined && ks(root) == Seq(1, 2, 3),
      "restore to the vacuum floor failed to recover the state")
    // below the floor: the AS-OF expiry, loudly
    val e = intercept[IllegalArgumentException] {
      Lakehouse.occRestore(spark, root, 0)
    }
    assert(e.getMessage.contains("expired"), s"unnamed refusal: ${e.getMessage}")
  }

  test("live row-level deletes refuse; a retired delete file does not block") {
    import spark.implicits._
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2, 3))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
    val keys = new java.io.File(root, "d1")
    Seq(2).toDF("k").coalesce(1).write.parquet(keys.getAbsolutePath)
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
      eqDeletes = Seq(keys.getAbsolutePath))
    val e = intercept[IllegalArgumentException] {
      Lakehouse.occRestore(spark, root, 0)
    }
    assert(e.getMessage.contains("row-level deletes"),
      s"unnamed refusal: ${e.getMessage}")
    // conversion retires the delete file — restore no longer blocked
    // (the masks are now dv'd, still refused) — so retire via a direct
    // remove of the delete file instead: the retired eqdel is inert
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 1,
      removes = Seq(keys.getAbsolutePath))
    assert(Lakehouse.occRestore(spark, root, 2).isEmpty,
      "restore to the current state should be a no-op on a retired-eqdel log")
    // … but a target version where the since-retired eqdel WAS live
    // still refuses (round-17 self-review: liveness-now alone would
    // have silently "no-op'd" here, dropping the mask the v1 state had)
    val e2 = intercept[IllegalArgumentException] {
      Lakehouse.occRestore(spark, root, 1)
    }
    assert(e2.getMessage.contains("row-level deletes"),
      s"unnamed refusal: ${e2.getMessage}")
  }

  test("ADVICE r16: a dv'd-then-rewritten file does not block restore to a pre-dv version; masked target versions still refuse") {
    import spark.implicits._
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2, 3))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1) // v0
    // v1: dv masks k=2; v2: a rewrite retires `a` (mask applied), so
    // the dv is fully RETIRED now — no live mask anywhere
    val sidecar = new java.io.File(root, "dv1")
    spark.read.parquet(a)
      .select(org.apache.spark.sql.functions.col("_metadata.file_path")
        .as("file"),
        org.apache.spark.sql.functions.col("_metadata.row_index").as("pos"),
        $"k")
      .filter($"k" === 2).select($"file", $"pos")
      .coalesce(1).write.parquet(sidecar.getAbsolutePath)
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
      dvs = Seq((a, sidecar.getAbsolutePath)))
    Lakehouse.occCompact(spark, root, Seq(a), "c0", snapshotVersion = 1,
      stats = d => Seq((d.getAbsolutePath, 2L, 0L, 100L, 0L, 100L)))
    assert(ks(root) == Seq(1, 3), "pre-restore state wrong")
    // restore to v0 (pre-dv): the retired mask is inert — the old
    // unconditional dv check blocked this forever (ADVICE r16 low)
    val res = Lakehouse.occRestore(spark, root, 0)
    assert(res.isDefined && ks(root) == Seq(1, 2, 3),
      "restore to the pre-dv version failed or lost rows")
    // restore to v1 (the dv WAS live on a file visible there): the
    // resurrected copy would drop the mask — refuse loudly
    val e = intercept[IllegalArgumentException] {
      Lakehouse.occRestore(spark, root, 1)
    }
    assert(e.getMessage.contains("row-level deletes"),
      s"unnamed refusal: ${e.getMessage}")
  }

  test("ADVICE r17: the restore mask guard sees masks netted out of the " +
    "pointer checkpoint on a truncated log") {
    import spark.implicits._
    val root = freshRoot()
    // v0 add `a`; cp_0; v1 dv on `a`; v2 rewrite retiring `a`; cp_2.
    // Then v0's commit expires (cp_0 retained) — the ADVICE scenario:
    // the planning frame bootstraps through the POINTER (cp_2), which
    // nets out the dv (its file was retired at v2), so the old guard
    // missed a mask that was LIVE at v1 and a restore to v1 would have
    // resurrected `a` WITHOUT its mask — deleted rows reappearing.
    val a = stage(root, "a", Seq(1, 2, 3))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1) // v0
    Lakehouse.occCheckpoint(spark, root, upTo = 0)
    val sidecar = new java.io.File(root, "dv1")
    spark.read.parquet(a)
      .select(org.apache.spark.sql.functions.col("_metadata.file_path")
        .as("file"),
        org.apache.spark.sql.functions.col("_metadata.row_index").as("pos"),
        $"k")
      .filter($"k" === 2).select($"file", $"pos")
      .coalesce(1).write.parquet(sidecar.getAbsolutePath)
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
      dvs = Seq((a, sidecar.getAbsolutePath)))                        // v1
    Lakehouse.occCompact(spark, root, Seq(a), "c0", snapshotVersion = 1,
      stats = d => Seq((d.getAbsolutePath, 2L, 0L, 100L, 0L, 100L))) // v2
    Lakehouse.occCheckpoint(spark, root, upTo = 2)
    // simulate the retention expiry of v0 alone (cp_0 stays retained —
    // the e34 floor shape); the log now starts at v1 with pointer = 2
    Mixing.deleteRecursively(
      new java.io.File(root, "commits/v00000.parquet").toPath)
    // the guard must resolve through the OLDEST retained usable
    // checkpoint <= v (cp_0), where the v1 dv is an explicit action —
    // restore to v1 refuses instead of resurrecting `a` unmasked
    val e = intercept[IllegalArgumentException] {
      Lakehouse.occRestore(spark, root, 1)
    }
    assert(e.getMessage.contains("row-level deletes"),
      s"unnamed refusal: ${e.getMessage}")
    // the guard stays scoped: at v0 the dv was not yet live and touches
    // no kept file, so the pre-dv restore still lands (the ADVICE r16
    // contract, now also on a truncated log)
    val res = Lakehouse.occRestore(spark, root, 0)
    assert(res.isDefined && ks(root) == Seq(1, 2, 3),
      "restore to the pre-dv version failed on the truncated log")
  }

  test("e38: restore-through-deletes retires both mask flavors then rolls back; masked target versions still refuse") {
    import spark.implicits._
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2, 3))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1) // v0
    val b = stage(root, "b", Seq(4))
    Lakehouse.occCommit(spark, root, Seq(fr(b)), snapshotVersion = 0)  // v1
    // v2: dv masks k=2 in a; v3: eqdel kills k=3 (below-sequence only)
    val sidecar = new java.io.File(root, "dv1")
    spark.read.parquet(a)
      .select(org.apache.spark.sql.functions.col("_metadata.file_path")
        .as("file"),
        org.apache.spark.sql.functions.col("_metadata.row_index").as("pos"),
        $"k")
      .filter($"k" === 2).select($"file", $"pos")
      .coalesce(1).write.parquet(sidecar.getAbsolutePath)
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 1,
      dvs = Seq((a, sidecar.getAbsolutePath)))
    val keys = new java.io.File(root, "d1")
    Seq(3).toDF("k").coalesce(1).write.parquet(keys.getAbsolutePath)
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 2,
      eqDeletes = Seq(keys.getAbsolutePath))
    val maskedNow = Lakehouse.occScanAll(spark, root, Seq("k"))
      .select($"k").as[Int].collect().toSeq.sorted
    assert(maskedNow == Seq(1, 4), s"staged masked state wrong: $maskedNow")
    val synthStats: java.io.File => Seq[(String, Long, Long, Long, Long, Long)] =
      d => Seq((d.getAbsolutePath, 0L, 0L, 100L, 0L, 100L))

    // a target where a mask WAS live refuses even through the prep
    // (the maintenance commits land — they are idempotent reshapes)
    val e = intercept[IllegalArgumentException] {
      Lakehouse.occRestoreThroughDeletes(spark, root, 2, synthStats)
    }
    assert(e.getMessage.contains("row-level deletes"),
      s"unnamed refusal: ${e.getMessage}")

    // a mask-free target restores: both flavors rolled back, the kept
    // file (b) untouched, the masked file (a) resurrected whole
    val res = Lakehouse.occRestoreThroughDeletes(spark, root, 1, synthStats)
    assert(res.isDefined, "restore-through-deletes was a no-op")
    assert(ks(root) == Seq(1, 2, 3, 4),
      "restore-through-deletes did not recover the pre-delete state")
    // no live mask remains anywhere: the single-flavor scan accepts
    // the log (flavor guards would refuse a live eqdel)
    assert(Lakehouse.occScanVisible(spark, root)
      .select($"k").as[Int].collect().toSeq.sorted == Seq(1, 2, 3, 4))
  }
}
