package graft.operators

import graft.SparkTestBase

/** Pins e25/e26's deletion-vector actions on the OCC log:
  *
  *  - conflict semantics: a row-level DELETE racing a rewrite of the
  *    SAME file aborts in either order (the rewrite would orphan the
  *    mask), two DELETEs on the same file conflict, disjoint files
  *    serialize;
  *  - scan semantics: [[Lakehouse.occScanVisible]] equals a direct
  *    predicate filter, masks of files a rewrite retired are dropped
  *    with their file (the rewrite applied them physically);
  *  - feed semantics: a dataChange dv action emits EXACTLY the masked
  *    positions as deletes (value-pinned at scale by e26's oracle).
  */
class OccDvSpec extends SparkTestBase {

  private def freshRoot(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("occdv_spec_").toFile
    d.deleteOnExit()
    d
  }

  /** Stage ks as one real parquet dir and return its path. */
  private def stage(root: java.io.File, name: String,
                    ks: Seq[Int]): String = {
    import spark.implicits._
    val d = new java.io.File(root, name)
    ks.map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.parquet(d.getAbsolutePath)
    d.getAbsolutePath
  }

  private def fr(f: String) = (f, 1L, 0L, 100L, 0L, 100L)

  /** A sidecar masking `ks` inside file dir `f` (positions via the same
    * metadata columns the scan joins on). */
  private def sidecar(root: java.io.File, name: String, f: String,
                      ks: Seq[Int]): String = {
    import spark.implicits._
    val d = new java.io.File(root, name)
    spark.read.parquet(f)
      .select(org.apache.spark.sql.functions.col("_metadata.file_path")
          .as("file"),
        org.apache.spark.sql.functions.col("_metadata.row_index").as("pos"),
        org.apache.spark.sql.functions.col("k"))
      .filter($"k".isin(ks: _*)).select($"file", $"pos")
      .coalesce(1).write.parquet(d.getAbsolutePath)
    d.getAbsolutePath
  }

  test("a DELETE racing a rewrite of the same file aborts in either order; disjoint files serialize") {
    // order 1: the dv commit loses the slot to a compaction of its file
    locally {
      val root = freshRoot()
      val a = stage(root, "a", Seq(1, 2, 3))
      val p = stage(root, "p", Seq(1, 2, 3))
      Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
      val sc = sidecar(root, "sc", a, Seq(2))
      val ex = intercept[java.util.ConcurrentModificationException] {
        Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
          dvs = Seq((a, sc)),
          onAttempt = n => if (n == 0) {
            Lakehouse.occCommit(spark, root, Seq(fr(p)), snapshotVersion = 0,
              removes = Seq(a), dataChange = false)
            ()
          })
      }
      assert(ex.getMessage.contains(a.split('/').last) ||
        ex.getMessage.contains(a), s"abort should name the file: $ex")
    }
    // order 2: the compaction loses the slot to a dv on its victim
    locally {
      val root = freshRoot()
      val a = stage(root, "a", Seq(1, 2, 3))
      val p = stage(root, "p", Seq(1, 2, 3))
      Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
      val sc = sidecar(root, "sc", a, Seq(2))
      intercept[java.util.ConcurrentModificationException] {
        Lakehouse.occCommit(spark, root, Seq(fr(p)), snapshotVersion = 0,
          removes = Seq(a), dataChange = false,
          onAttempt = n => if (n == 0) {
            Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
              dvs = Seq((a, sc)))
            ()
          })
      }
    }
    // two DELETEs on the same file conflict; on DIFFERENT files they
    // serialize (one retry, both land)
    locally {
      val root = freshRoot()
      val a = stage(root, "a", Seq(1, 2, 3))
      val b = stage(root, "b", Seq(4, 5, 6))
      Lakehouse.occCommit(spark, root, Seq(fr(a), fr(b)), snapshotVersion = -1)
      val s1 = sidecar(root, "s1", a, Seq(1))
      val s2 = sidecar(root, "s2", a, Seq(3))
      val s3 = sidecar(root, "s3", b, Seq(4))
      intercept[java.util.ConcurrentModificationException] {
        Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
          dvs = Seq((a, s2)),
          onAttempt = n => if (n == 0) {
            Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
              dvs = Seq((a, s1)))
            ()
          })
      }
      val r = Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
        dvs = Seq((b, s3)),
        onAttempt = n => ())
      assert(r.retries == 0 && r.version == 2,
        s"the disjoint DELETE should land at the head: $r")
    }
  }

  test("masked scan equals a direct filter; a rewrite retires its victim's mask") {
    import spark.implicits._
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2, 3, 4))
    val b = stage(root, "b", Seq(5, 6))
    Lakehouse.occCommit(spark, root, Seq(fr(a), fr(b)), snapshotVersion = -1)
    val sc = sidecar(root, "sc", a, Seq(2, 4))
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
      dvs = Seq((a, sc)))
    val masked = Lakehouse.occScanVisible(spark, root)
      .select($"k").as[Int].collect().toSet
    assert(masked == Set(1, 3, 5, 6), s"masked scan wrong: $masked")

    // the DV purge: rewrite a WITHOUT its masked rows, retire it; the
    // mask must drop with the file (applying it again would be wrong
    // only if the rewrite had kept the rows — it didn't)
    val aPrime = stage(root, "a_rw", Seq(1, 3))
    Lakehouse.occCommit(spark, root, Seq(fr(aPrime)), snapshotVersion = 1,
      removes = Seq(a), dataChange = false)
    val after = Lakehouse.occScanVisible(spark, root)
      .select($"k").as[Int].collect().toSet
    assert(after == Set(1, 3, 5, 6),
      s"the rewrite changed the answer: $after")
    // and the feed treats none of it as a logical change
    assert(Lakehouse.occChangedFiles(spark, root, 1, 2) == ((Nil, Nil)) &&
      Lakehouse.occChangedDvs(spark, root, 1, 2).isEmpty,
      "the dataChange=false purge leaked into the feed")
  }

  test("a checkpoint carries live masks forward and drops a retired file's mask") {
    import spark.implicits._
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2, 3, 4))
    val b = stage(root, "b", Seq(5, 6))
    Lakehouse.occCommit(spark, root, Seq(fr(a), fr(b)), snapshotVersion = -1)
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
      dvs = Seq((a, sidecar(root, "sa", a, Seq(2))),
        (b, sidecar(root, "sb", b, Seq(5)))))
    // a's rewrite (mask applied physically) retires a and its mask
    val aPrime = stage(root, "a_rw", Seq(1, 3, 4))
    Lakehouse.occCommit(spark, root, Seq(fr(aPrime)), snapshotVersion = 1,
      removes = Seq(a), dataChange = false)
    Lakehouse.occCheckpoint(spark, root, upTo = 2)
    val cp = spark.read.parquet(new java.io.File(
      new java.io.File(root, "checkpoints"), "cp_v00002.parquet")
      .getAbsolutePath)
    val cpDvFiles = cp.filter($"action" === "dv")
      .select($"file").as[String].collect().toSeq
    assert(cpDvFiles == Seq(b),
      s"checkpoint should keep b's live mask and drop a's: $cpDvFiles")
    // a consumer bootstrapped from the checkpoint alone sees the same
    // masked answer as the full log
    val (frame, _) = Lakehouse.occBootstrap(spark, root)
    val files = Lakehouse.occVisible(frame)
      .select($"file").as[String].collect().toSeq.sorted
    val masks = frame.filter($"action" === "dv")
      .select($"dv").as[String].collect().toSeq.distinct
    val got = spark.read.parquet(files: _*)
      .withColumn("file", org.apache.spark.sql.functions
        .col("_metadata.file_path"))
      .withColumn("pos", org.apache.spark.sql.functions
        .col("_metadata.row_index"))
      .join(org.apache.spark.sql.functions.broadcast(
        spark.read.parquet(masks: _*)), Seq("file", "pos"), "left_anti")
      .select($"k").as[Int].collect().toSet
    val want = Lakehouse.occScanVisible(spark, root)
      .select($"k").as[Int].collect().toSet
    assert(got == want && got == Set(1, 3, 4, 6),
      s"checkpoint-bootstrapped masked scan diverged: $got vs $want")
  }

  test("a dataChange dv action feeds exactly the masked rows as deletes") {
    import spark.implicits._
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2, 3, 4))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
    val sc = sidecar(root, "sc", a, Seq(2, 4))
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
      dvs = Seq((a, sc)))
    val feed = Lakehouse.occChangeFeed(spark, root, 0, 1)
      .select($"change_type", $"k").as[(String, Int)].collect().toSet
    assert(feed == Set(("delete", 2), ("delete", 4)),
      s"dv feed rows wrong: $feed")
  }

  test("OPTIMIZE of a dv'd victim applies the mask; the packed file never resurrects deleted rows") {
    import spark.implicits._
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2, 3, 4))
    val b = stage(root, "b", Seq(5, 6))
    Lakehouse.occCommit(spark, root, Seq(fr(a), fr(b)), snapshotVersion = -1)
    val sc = sidecar(root, "sc", a, Seq(2, 4))
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
      dvs = Seq((a, sc)))
    val before = Lakehouse.occScanVisible(spark, root)
      .select($"k").as[Int].collect().toSet
    assert(before == Set(1, 3, 5, 6))
    // round-15 self-review pin: the victim's mask drops with the file,
    // so the compaction MUST apply it to the packed bytes — a raw byte
    // copy silently resurrected rows 2 and 4
    Lakehouse.occCompact(spark, root, Seq(a, b), "c0", snapshotVersion = 1,
      stats = d => Seq((d.getAbsolutePath, 0L, 0L, 100L, 0L, 100L)))
    val after = Lakehouse.occScanVisible(spark, root)
      .select($"k").as[Int].collect().toSet
    assert(after == Set(1, 3, 5, 6),
      s"compaction resurrected dv-deleted rows: $after")
  }
}
