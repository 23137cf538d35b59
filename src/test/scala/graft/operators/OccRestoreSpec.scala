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
  }
}
