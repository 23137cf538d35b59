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
}
