package graft.operators

import graft.SparkTestBase

/** Pins e27's equality deletes (Iceberg v2 sequence-number semantics):
  *
  *  - a delete at version d masks key-matching rows ONLY in files
  *    added below d; a later add with the same keys survives;
  *  - stacked deletes scope independently — each file is masked by
  *    exactly the deletes committed after it;
  *  - the REWRITE HAZARD: a naive byte-copy rewrite re-sequences its
  *    rows above every delete and RESURRECTS masked keys; the
  *    delete-aware rewrite ([[Lakehouse.occRewriteApplied]]) applies
  *    pending masks and preserves the answer;
  *  - an equality delete names no data file, so it never conflicts
  *    with a racing append.
  */
class OccEqDeleteSpec extends SparkTestBase {

  private def freshRoot(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("occeq_spec_").toFile
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

  private def keysFile(root: java.io.File, name: String,
                       ks: Seq[Int]): String = {
    import spark.implicits._
    val d = new java.io.File(root, name)
    ks.toDF("k").coalesce(1).write.parquet(d.getAbsolutePath)
    d.getAbsolutePath
  }

  private def fr(f: String) = (f, 1L, 0L, 100L, 0L, 100L)

  private def scanKs(root: java.io.File): Seq[Int] = {
    import spark.implicits._
    Lakehouse.occScanEq(spark, root, Seq("k"))
      .select($"k").as[Int].collect().toSeq.sorted
  }

  test("sequence rule: the delete masks only earlier files; stacked deletes scope per file") {
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2, 3))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1) // v0
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,         // v1
      eqDeletes = Seq(keysFile(root, "d1", Seq(2))))
    val b = stage(root, "b", Seq(2, 5))                             // v2:
    Lakehouse.occCommit(spark, root, Seq(fr(b)), snapshotVersion = 1)  // 2 reinserted
    assert(scanKs(root) == Seq(1, 2, 3, 5),
      "the delete leaked onto the later add (or missed the earlier one)")

    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 2,         // v3
      eqDeletes = Seq(keysFile(root, "d2", Seq(3, 5))))
    // a (v0) is masked by {2} and {3,5}; b (v2) only by {3,5}
    assert(scanKs(root) == Seq(1, 2),
      "stacked deletes did not scope per file")
  }

  test("a naive rewrite resurrects masked keys; the delete-aware rewrite preserves the answer") {
    // the hazard, demonstrated with real commits
    locally {
      val root = freshRoot()
      val a = stage(root, "a", Seq(1, 2, 3))
      Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
      Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
        eqDeletes = Seq(keysFile(root, "d1", Seq(2))))
      assert(scanKs(root) == Seq(1, 3))
      val aCopy = stage(root, "a_naive", Seq(1, 2, 3)) // byte copy
      Lakehouse.occCommit(spark, root, Seq(fr(aCopy)), snapshotVersion = 1,
        removes = Seq(a), dataChange = false)
      assert(scanKs(root) == Seq(1, 2, 3),
        "expected the naive rewrite to resurrect key 2 — hazard gone?")
    }
    // the fix
    locally {
      val root = freshRoot()
      val a = stage(root, "a", Seq(1, 2, 3))
      Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
      Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
        eqDeletes = Seq(keysFile(root, "d1", Seq(2))))
      val r = Lakehouse.occRewriteApplied(spark, root, a, Seq("k"), "rw0",
        snapshotVersion = 1,
        stats = d => Seq((d.getAbsolutePath, 0L, 0L, 0L, 0L, 0L)))
      assert(r.version == 2, s"rewrite should land at the head: $r")
      assert(scanKs(root) == Seq(1, 3),
        "the delete-aware rewrite changed the answer")
    }
  }

  test("an equality delete never conflicts with a racing append") {
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
    val b = stage(root, "b", Seq(3))
    val r = Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
      eqDeletes = Seq(keysFile(root, "d1", Seq(1))),
      onAttempt = n => if (n == 0) {
        Lakehouse.occCommit(spark, root, Seq(fr(b)), snapshotVersion = 0)
        ()
      })
    assert(r.retries == 1 && r.version == 2,
      s"the delete should have retried past the append and landed: $r")
    // b committed at v1 < the delete's v2, so ITS keys are in scope —
    // but none match; a's key 1 dies
    assert(scanKs(root) == Seq(2, 3), s"post-race scan wrong: ${scanKs(root)}")
  }

  test("e28: a checkpoint between delete and re-insert carries the pending eqdel; bootstrap ≡ full replay; the r14 flattened snapshot resurrects") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2, 3))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1) // v0
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,         // v1
      eqDeletes = Seq(keysFile(root, "d1", Seq(2))))
    Lakehouse.occCheckpoint(spark, root, upTo = 1)
    val b = stage(root, "b", Seq(2, 5))                             // v2:
    Lakehouse.occCommit(spark, root, Seq(fr(b)), snapshotVersion = 1)  // reinsert

    val (frame, tail) = Lakehouse.occBootstrap(spark, root)
    assert(tail == Seq(2), s"tail should be the post-checkpoint ingest: $tail")
    def ks(log: org.apache.spark.sql.DataFrame): Seq[Int] =
      Lakehouse.occScanEqFrame(spark, log, Seq("k"))
        .select($"k").as[Int].collect().toSeq.sorted
    // bootstrap ≡ full-log replay, row for row
    assert(ks(frame) == scanKs(root),
      "checkpoint bootstrap diverged from full-log replay under a pending eqdel")
    assert(ks(frame) == Seq(1, 2, 3, 5),
      "the snapshot's delete must mask the snapshot's add (key 2 in a) " +
        "while the tail's re-insert (key 2 in b) survives")
    // the r14 hazard, reproduced: a snapshot WITHOUT the eqdel rows
    // (what occCheckpoint used to write) resurrects the deleted key
    val flattened = frame.filter(col("action") =!= "eqdel")
    assert(ks(flattened) == Seq(1, 2, 2, 3, 5),
      "expected the eqdel-dropping snapshot to resurrect key 2 — hazard gone?")
  }

  test("per-app txn high-water survives its commit's files being compacted away, via the checkpoint's txn rows") {
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1) // v0
    val b = stage(root, "b", Seq(3))
    Lakehouse.occCommit(spark, root, Seq(fr(b)), snapshotVersion = 0,  // v1
      txn = Some(("ingest", 7L)))
    // the app's ONLY commit's file is compacted away (its net-add row —
    // and with it the txn columns — leaves the checkpoint)
    val packed = stage(root, "packed", Seq(1, 2, 3))
    Lakehouse.occCommit(spark, root, Seq(fr(packed)), snapshotVersion = 1,
      removes = Seq(a, b), dataChange = false)                      // v2
    Lakehouse.occCheckpoint(spark, root, upTo = 2)
    // bootstrap path (checkpoint exists): the explicit txn row answers
    assert(Lakehouse.occLastTxn(spark, root, "ingest") == 7L,
      "txn high-water lost across compaction + checkpoint — " +
        "a restarted writer would re-ingest a replayed batch")
    assert(Lakehouse.occLastTxn(spark, root, "nobody") == -1L)
  }

  test("e31: equality→positional conversion preserves the sequence answer, is idempotent, and flips the scan flavor") {
    import spark.implicits._
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2, 3))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1) // v0
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,         // v1
      eqDeletes = Seq(keysFile(root, "d1", Seq(2))))
    val b = stage(root, "b", Seq(2, 5))                                // v2:
    Lakehouse.occCommit(spark, root, Seq(fr(b)), snapshotVersion = 1)  // reinsert
    val expected = scanKs(root)
    assert(expected == Seq(1, 2, 3, 5))
    // pre-conversion, the positional scan refuses the LIVE eqdel
    intercept[IllegalArgumentException] {
      Lakehouse.occScanVisible(spark, root).count()
    }
    assert(Lakehouse.occConvertEqDeletes(spark, root) == 1)
    // post-conversion the retired eqdel is admitted and the positional
    // scan answers the identical sequence-scoped result: a's key 2 is
    // position-masked, b's re-inserted key 2 survives
    val converted = Lakehouse.occScanVisible(spark, root)
      .select($"k").as[Int].collect().toSeq.sorted
    assert(converted == expected,
      s"conversion changed the answer: $converted vs $expected")
    // idempotent: no live deletes remain, nothing commits
    val head = Lakehouse.occVersions(new java.io.File(root, "commits")).last
    assert(Lakehouse.occConvertEqDeletes(spark, root) == 0)
    assert(Lakehouse.occVersions(new java.io.File(root, "commits")).last == head,
      "a second conversion committed something")
  }

  test("e32: the unified scan applies both flavors by intersection; single-flavor scans refuse the mixed log") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2, 3))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1) // v0
    // v1: positional delete of a's k=2 row
    val sidecar = new java.io.File(root, "dv1")
    spark.read.parquet(a)
      .select(col("_metadata.file_path").as("file"),
        col("_metadata.row_index").as("pos"), $"k")
      .filter($"k" === 2).select($"file", $"pos")
      .coalesce(1).write.parquet(sidecar.getAbsolutePath)
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
      dvs = Seq((a, sidecar.getAbsolutePath)))
    // v2: equality delete of key 3 (sequences above a, below b)
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 1,
      eqDeletes = Seq(keysFile(root, "d1", Seq(3))))
    // v3: re-insert of 2 and 3 — above the eqdel, not named by the dv
    val b = stage(root, "b", Seq(2, 3))
    Lakehouse.occCommit(spark, root, Seq(fr(b)), snapshotVersion = 2)
    // both single-flavor entry points refuse the mixed log
    intercept[IllegalArgumentException] {
      Lakehouse.occScanVisible(spark, root).count()
    }
    intercept[IllegalArgumentException] {
      Lakehouse.occScanEq(spark, root, Seq("k")).count()
    }
    // unified: a loses 2 (position) and 3 (key, below sequence); b's
    // 2 and 3 both survive (above the eqdel, unnamed by the dv)
    val ks = Lakehouse.occScanAll(spark, root, Seq("k"))
      .select($"k").as[Int].collect().toSeq.sorted
    assert(ks == Seq(1, 2, 3), s"unified scan wrong: $ks")
  }

  test("e29 feed netting: rows deleted row-level (dv or eqdel) are not re-emitted when their file is later removed") {
    import spark.implicits._
    // eqdel flavor: a(1,2,3) @v0; eqdel {2} @v1; remove a @v2 (dataChange)
    locally {
      val root = freshRoot()
      val a = stage(root, "a", Seq(1, 2, 3))
      Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
      Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
        eqDeletes = Seq(keysFile(root, "d1", Seq(2))))
      Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 1,
        removes = Seq(a))
      val deletes = Lakehouse.occChangeFeed(spark, root, 0, 2)
        .filter($"change_type" === "delete")
        .select($"k").as[Int].collect().toSeq.sorted
      assert(deletes == Seq(1, 2, 3),
        s"each row must be emitted as deleted exactly once, got $deletes")
    }
    // dv flavor: a(1,2,3) @v0; dv masks k=2 @v1; remove a @v2
    locally {
      val root = freshRoot()
      val a = stage(root, "a", Seq(1, 2, 3))
      Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
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
      Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 1,
        removes = Seq(a))
      val deletes = Lakehouse.occChangeFeed(spark, root, 0, 2)
        .filter($"change_type" === "delete")
        .select($"k").as[Int].collect().toSeq.sorted
      assert(deletes == Seq(1, 2, 3),
        s"the dv-masked row was re-emitted by the whole-file remove: $deletes")
    }
  }

  test("dv feed netting (ADVICE r15): a dv image nets rows already deleted by an earlier eqdel or an earlier dv") {
    import spark.implicits._
    def sidecarFor(root: java.io.File, a: String, name: String,
                   ks: Seq[Int]): String = {
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
    // eqdel-then-dv: a(1,2,3) @v0; eqdel {2} @v1; dv masks k=2 @v2 —
    // the row deleted at v1 must not be emitted AGAIN at v2
    locally {
      val root = freshRoot()
      val a = stage(root, "a", Seq(1, 2, 3))
      Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
      Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
        eqDeletes = Seq(keysFile(root, "d1", Seq(2))))
      Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 1,
        dvs = Seq((a, sidecarFor(root, a, "dv1", Seq(2)))))
      val deletes = Lakehouse.occChangeFeed(spark, root, 0, 2)
        .filter($"change_type" === "delete")
        .select($"k").as[Int].collect().toSeq.sorted
      assert(deletes == Seq(2),
        s"the eqdel-deleted row was re-emitted by the later dv: $deletes")
    }
    // dv-then-dv overlap: dv {2} @v1, dv {2,3} @v2 — the shared
    // position is one delete image, not two
    locally {
      val root = freshRoot()
      val a = stage(root, "a", Seq(1, 2, 3))
      Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
      Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
        dvs = Seq((a, sidecarFor(root, a, "dv1", Seq(2)))))
      Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 1,
        dvs = Seq((a, sidecarFor(root, a, "dv2", Seq(2, 3)))))
      val deletes = Lakehouse.occChangeFeed(spark, root, 0, 2)
        .filter($"change_type" === "delete")
        .select($"k").as[Int].collect().toSeq.sorted
      assert(deletes == Seq(2, 3),
        s"overlapping dv masks double-emitted the shared row: $deletes")
    }
  }
}
