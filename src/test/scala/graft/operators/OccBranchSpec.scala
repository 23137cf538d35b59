package graft.operators

import graft.SparkTestBase

/** Pins e39's refs plane (Iceberg refs / write-audit-publish):
  *
  *  - branch isolation: branch commits are invisible to main until
  *    publish; the branch scan replays base + branch namespace;
  *  - publish ATOMICITY: the branch's net change is ONE main commit
  *    (a multi-commit branch squashes — all-or-nothing by the claim
  *    protocol), after which branch == main and a re-publish no-ops;
  *  - not-fast-forwardable: main advancing past the base refuses
  *    loudly, and nothing lands;
  *  - tag immutability: re-claiming a tag name is a detected conflict;
  *  - the VACUUM REF CLAMP: a vacuum can never expire a version a tag
  *    or branch base still references — dropping the ref re-arms it.
  */
class OccBranchSpec extends SparkTestBase {

  private def freshRoot(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("occbranch_spec_").toFile
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

  private def mainKs(root: java.io.File): Seq[Int] = {
    import spark.implicits._
    Lakehouse.occScanVisible(spark, root)
      .select($"k").as[Int].collect().toSeq.sorted
  }

  private def branchKs(root: java.io.File, name: String): Seq[Int] = {
    import spark.implicits._
    Lakehouse.occBranchScan(spark, root, name)
      .select($"k").as[Int].collect().toSeq.sorted
  }

  test("branch isolation, multi-commit squash publish, and re-publish no-op") {
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
    assert(Lakehouse.occBranch(root, "wap") == 0)
    // two branch commits: ingest b, then a branch-side rewrite that
    // retires `a` for packed (so the publish diff carries adds AND
    // removes)
    val b = stage(root, "b", Seq(3))
    val r1 = Lakehouse.occBranchCommit(spark, root, "wap", Seq(fr(b)))
    assert(r1.version == 1, s"branch claim floor wrong: v${r1.version}")
    val packed = stage(root, "packed", Seq(1, 2))
    val r2 = Lakehouse.occBranchCommit(spark, root, "wap", Seq(fr(packed)),
      removes = Seq(a))
    assert(r2.version == 2)
    // isolation: main unchanged, branch sees the full rewrite
    assert(mainKs(root) == Seq(1, 2), "branch commits leaked into main")
    assert(branchKs(root, "wap") == Seq(1, 2, 3))
    // publish: ONE commit (v1 on main), net diff only
    val pub = Lakehouse.occPublishBranch(spark, root, "wap")
    assert(pub.exists(_.version == 1), s"publish not atomic: $pub")
    assert(Lakehouse.occVersions(new java.io.File(root, "commits")) ==
      Seq(0, 1), "publish landed more than one main commit")
    assert(mainKs(root) == Seq(1, 2, 3))
    assert(branchKs(root, "wap") == Seq(1, 2, 3),
      "branch must equal main after publish")
    assert(Lakehouse.occPublishBranch(spark, root, "wap").isEmpty,
      "re-publish was not a no-op")
    // branch keeps working after publish: next commit claims above main
    val c = stage(root, "c", Seq(4))
    assert(Lakehouse.occBranchCommit(spark, root, "wap", Seq(fr(c)))
      .version == 2)
    assert(branchKs(root, "wap") == Seq(1, 2, 3, 4))
    assert(mainKs(root) == Seq(1, 2, 3))
  }

  test("main advancing past the base refuses publish; tags are immutable") {
    val root = freshRoot()
    val a = stage(root, "a", Seq(1))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
    Lakehouse.occBranch(root, "wap")
    val b = stage(root, "b", Seq(2))
    Lakehouse.occBranchCommit(spark, root, "wap", Seq(fr(b)))
    // a main writer lands first
    val c = stage(root, "c", Seq(3))
    Lakehouse.occCommit(spark, root, Seq(fr(c)), snapshotVersion = 0)
    val e = intercept[IllegalArgumentException] {
      Lakehouse.occPublishBranch(spark, root, "wap")
    }
    assert(e.getMessage.contains("not fast-forwardable"),
      s"unnamed refusal: ${e.getMessage}")
    assert(mainKs(root) == Seq(1, 3), "a refused publish mutated main")

    Lakehouse.occTag(root, "prod", 0)
    intercept[java.util.ConcurrentModificationException] {
      Lakehouse.occTag(root, "prod", 1)
    }
    assert(Lakehouse.occTagVersion(root, "prod") == 0)
  }

  test("e41: rebase replays the branch diff onto main's head — disjoint progress rebases, shared files refuse, extra branch commits squash without duplication") {
    val root = freshRoot()
    val a = stage(root, "a", Seq(1))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
    Lakehouse.occBranch(root, "wap")
    // TWO branch commits (more than main will advance — the replay
    // must retire BOTH old claims, including the one above main head)
    val b = stage(root, "b", Seq(2))
    Lakehouse.occBranchCommit(spark, root, "wap", Seq(fr(b)))
    val b2 = stage(root, "b2", Seq(5))
    Lakehouse.occBranchCommit(spark, root, "wap", Seq(fr(b2)))
    // main advances by ONE disjoint commit
    val c = stage(root, "c", Seq(3))
    Lakehouse.occCommit(spark, root, Seq(fr(c)), snapshotVersion = 0)
    intercept[IllegalArgumentException] {
      Lakehouse.occPublishBranch(spark, root, "wap")
    }
    assert(Lakehouse.occRebaseBranch(spark, root, "wap") == 1)
    assert(Lakehouse.occBranchBase(root, "wap") == 1)
    // branch now sees main's progress AND its own diff, exactly once
    assert(branchKs(root, "wap") == Seq(1, 2, 3, 5),
      "rebased branch state wrong (lost or duplicated a file)")
    // exactly one replay commit remains in the branch namespace
    assert(Lakehouse.occVersions(new java.io.File(
      Lakehouse.occBranchRoot(root, "wap"), "commits")).size == 1,
      "rebase left stale pre-rebase branch commits behind")
    // rebase onto an unchanged head is a no-op
    assert(Lakehouse.occRebaseBranch(spark, root, "wap") == 1)
    // publish fast-forwards now
    val pub = Lakehouse.occPublishBranch(spark, root, "wap")
    assert(pub.exists(_.version == 2))
    assert(mainKs(root) == Seq(1, 2, 3, 5))

    // CONFLICT: a second branch retires a file main also touches
    Lakehouse.occBranch(root, "clash")
    val packed = stage(root, "packed", Seq(1))
    Lakehouse.occBranchCommit(spark, root, "clash", Seq(fr(packed)),
      removes = Seq(a))
    // main rewrites the SAME file `a` concurrently
    val packed2 = stage(root, "packed2", Seq(1))
    Lakehouse.occCommit(spark, root, Seq(fr(packed2)), snapshotVersion = 2,
      removes = Seq(a), dataChange = false)
    val e = intercept[IllegalArgumentException] {
      Lakehouse.occRebaseBranch(spark, root, "clash")
    }
    assert(e.getMessage.contains("rebase conflict"),
      s"unnamed refusal: ${e.getMessage}")
  }

  test("refs work on a fully-truncated log: branch at the checkpointed head, publish claims above the snapshot") {
    // head-checkpointed + vacuumed → the commits dir is EMPTY but the
    // table has state; every ref op used `.last` on the empty dir and
    // crashed unnamed (round-17 self-review) — the head now resolves
    // through the checkpoint pointer
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
    Lakehouse.occCheckpoint(spark, root, upTo = 0)
    Lakehouse.occVacuum(spark, root)
    assert(Lakehouse.occVersions(new java.io.File(root, "commits")).isEmpty)
    assert(Lakehouse.occBranch(root, "wap") == 0,
      "branch base must resolve to the checkpointed head")
    val b = stage(root, "b", Seq(3))
    Lakehouse.occBranchCommit(spark, root, "wap", Seq(fr(b)))
    assert(branchKs(root, "wap") == Seq(1, 2, 3))
    assert(mainKs(root) == Seq(1, 2), "branch leaked into truncated main")
    val pub = Lakehouse.occPublishBranch(spark, root, "wap")
    assert(pub.exists(_.version == 1),
      s"publish must claim above the snapshot, got $pub")
    assert(mainKs(root) == Seq(1, 2, 3))
  }

  test("the vacuum floor never expires a version a tag or branch base references; dropping the ref re-arms it") {
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
    Lakehouse.occCheckpoint(spark, root, upTo = 0)
    val b = stage(root, "b", Seq(3))
    Lakehouse.occCommit(spark, root, Seq(fr(b)), snapshotVersion = 0)
    Lakehouse.occCheckpoint(spark, root, upTo = 1)
    val c = stage(root, "c", Seq(4))
    Lakehouse.occCommit(spark, root, Seq(fr(c)), snapshotVersion = 1)
    // tag v0: with zero retention the floor would be the pointer (1) —
    // which would expire cp_0 and v0 with it — but the tag clamps the
    // floor to 0, so cp_0 survives and AS OF the tag still answers
    Lakehouse.occTag(root, "old", 0)
    val (t1, _) = Lakehouse.occVacuum(spark, root)
    assert(t1 == Seq(0), s"clamped vacuum floor drifted: $t1")
    assert(Lakehouse.occCheckpointVersions(root) == Seq(0, 1),
      "the clamped vacuum expired the tagged version's checkpoint")
    assert(Lakehouse.occAsOf(spark, root, 0).count() == 1,
      "AS OF a tagged version stopped answering after a clamped vacuum")
    import spark.implicits._
    assert(Lakehouse.occAsOf(spark, root,
      Lakehouse.occTagVersion(root, "old"))
      .select($"file").as[String].collect().toSeq == Seq(a))
    // drop the tag: the full vacuum proceeds to the pointer
    Lakehouse.occDropRef(root, "tag_old")
    val (t2, _) = Lakehouse.occVacuum(spark, root)
    assert(t2.nonEmpty && t2.max == 1,
      s"post-drop vacuum did not reach the pointer: $t2")
    intercept[IllegalArgumentException] {
      Lakehouse.occAsOf(spark, root, 0)
    }
  }

  test("ADVICE r17: a drop that crashed mid-way never leaks a dead " +
    "incarnation's commits into a re-created branch") {
    val root = freshRoot()
    val a = stage(root, "a", Seq(1, 2))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
    assert(Lakehouse.occBranch(root, "audit") == 0)
    val b = stage(root, "b", Seq(3))
    Lakehouse.occBranchCommit(spark, root, "audit", Seq(fr(b)))
    assert(branchKs(root, "audit") == Seq(1, 2, 3))
    // simulate the LEGACY crash window (pre-r18 occDropRef deleted the
    // ref first): ref file gone, branches/audit/commits still present
    java.nio.file.Files.delete(
      new java.io.File(Lakehouse.occRefsDir(root), "branch_audit").toPath)
    // re-creating the branch must refuse to adopt the stale namespace
    val e = intercept[IllegalArgumentException] {
      Lakehouse.occBranch(root, "audit")
    }
    assert(e.getMessage.contains("already holds commits"))
    // completing the drop clears the orphaned namespace (the ref is
    // already gone — deleteIfExists tolerates the legacy window); a
    // fresh branch then sees exactly the new base and nothing of the
    // dead incarnation. Dropping a ref with NO trace left refuses.
    Lakehouse.occDropRef(root, "branch_audit")
    intercept[IllegalArgumentException] {
      Lakehouse.occDropRef(root, "branch_audit")
    }
    assert(Lakehouse.occBranch(root, "audit") == 0)
    assert(branchKs(root, "audit") == Seq(1, 2),
      "the re-created branch adopted the dead incarnation's commits")
    // the NEW ordering (namespace first, ref last): a drop interrupted
    // after the namespace delete leaves only a dangling ref, which the
    // put-if-absent claim reports loudly instead of silently adopting
    val broot = Lakehouse.occBranchRoot(root, "audit")
    Mixing.deleteRecursively(broot.toPath)
    intercept[java.util.ConcurrentModificationException] {
      Lakehouse.occBranch(root, "audit")
    }
    Lakehouse.occDropRef(root, "branch_audit") // tolerate: completes cleanup
    assert(Lakehouse.occBranch(root, "audit") == 0)
  }

  test("ADVICE r17: refs validate their version at creation and " +
    "torn ref bodies cannot exist") {
    val root = freshRoot()
    val a = stage(root, "a", Seq(1))
    Lakehouse.occCommit(spark, root, Seq(fr(a)), snapshotVersion = -1)
    // a future version refuses at tag time, not at AS-OF time
    val e = intercept[IllegalArgumentException] {
      Lakehouse.occTag(root, "future", 7)
    }
    assert(e.getMessage.contains("head is v0"))
    intercept[IllegalArgumentException] {
      Lakehouse.occTag(root, "negative", -1)
    }
    // valid tag lands; its body is complete (tmp+link staging means a
    // reader can never observe a torn ref — pinned by reading it back)
    Lakehouse.occTag(root, "prod", 0)
    assert(Lakehouse.occTagVersion(root, "prod") == 0)
    // no stray tmp staging files survive in the refs dir
    val leftovers = Lakehouse.occRefsDir(root).listFiles()
      .map(_.getName).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"staging leftovers: ${leftovers.toSeq}")
  }
}
