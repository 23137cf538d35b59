package graft.operators

import graft.SparkTestBase

/** Pins e37's column-mapping schema evolution (Delta column mapping /
  * Iceberg field ids):
  *
  *  - RENAME and DROP are metadata commits: the generations' parquet
  *    bytes are byte-identical across an evolution;
  *  - the read maps BY FIELD ID: a renamed column surfaces old files'
  *    physical bytes under the new logical name; a dropped id is never
  *    selected; a RE-ADDED same-name column (fresh id) does NOT
  *    resurrect the old generation's same-named bytes;
  *  - a generation predating a column surfaces typed NULLs, and a
  *    current column no generation carries yet surfaces as a typed
  *    null column (never NullType);
  *  - a generation stamped with an unknown schema version refuses
  *    loudly.
  */
class SchemaMappingSpec extends SparkTestBase {

  import org.apache.spark.sql.functions.col

  private def freshRoot(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("colmap_spec_").toFile
    d.deleteOnExit()
    d
  }

  private def sha(f: java.io.File): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    java.util.Base64.getEncoder.encodeToString(
      md.digest(java.nio.file.Files.readAllBytes(f.toPath)))
  }

  private def partHashes(dir: java.io.File): Map[String, String] =
    dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> sha(f)).toMap

  test("rename + drop are metadata-only; id-mapped read renames through and never resurrects a dropped-then-readded column") {
    import spark.implicits._
    val root = freshRoot()
    // schema v0: k (id 1), price (id 2), tag (id 3)
    Lakehouse.writeMappedSchema(root, 0, Seq(
      Lakehouse.MappedField(1, "k", "k", "INT"),
      Lakehouse.MappedField(2, "price", "price", "DOUBLE"),
      Lakehouse.MappedField(3, "tag", "tag", "STRING")))
    val gen0 = new java.io.File(root, "gen0")
    Seq((1, 10.0, "a"), (2, 20.0, "b")).toDF("k", "price", "tag")
      .coalesce(1).write.parquet(gen0.getAbsolutePath)
    Lakehouse.stampMappedGeneration(gen0, 0)
    val bytesBefore = partHashes(gen0)

    // v1: RENAME tag → label (id 3 kept), DROP price (id 2)
    Lakehouse.writeMappedSchema(root, 1, Seq(
      Lakehouse.MappedField(1, "k", "k", "INT"),
      Lakehouse.MappedField(3, "label", "label", "STRING")))
    val gen1 = new java.io.File(root, "gen1")
    Seq((3, "c")).toDF("k", "label")
      .coalesce(1).write.parquet(gen1.getAbsolutePath)
    Lakehouse.stampMappedGeneration(gen1, 1)

    // v2: re-ADD a column NAMED price under a FRESH id (4)
    Lakehouse.writeMappedSchema(root, 2, Seq(
      Lakehouse.MappedField(1, "k", "k", "INT"),
      Lakehouse.MappedField(3, "label", "label", "STRING"),
      Lakehouse.MappedField(4, "price", "price", "DOUBLE")))
    val gen2 = new java.io.File(root, "gen2")
    Seq((4, "d", 99.0)).toDF("k", "label", "price")
      .coalesce(1).write.parquet(gen2.getAbsolutePath)
    Lakehouse.stampMappedGeneration(gen2, 2)

    val scan = Lakehouse.mappedScan(spark, root)
    assert(scan.columns.toSeq == Seq("k", "label", "price"),
      s"current schema order drifted: ${scan.columns.toSeq}")
    val rows = scan
      .select($"k", $"label", $"price")
      .as[(Int, String, Option[Double])].collect().toSeq.sortBy(_._1)
    // rename reaches gen0's physical `tag`; gen0's physical `price`
    // bytes (dropped id 2) do NOT surface under the re-added id 4
    assert(rows == Seq(
      (1, "a", None), (2, "b", None), (3, "c", None), (4, "d", Some(99.0))),
      s"mapped rows wrong: $rows")
    // metadata-only: no generation byte moved across two evolutions
    assert(partHashes(gen0) == bytesBefore,
      "a schema evolution rewrote generation bytes")

    // e40 SCHEMA TIME TRAVEL: AS OF epoch v0 only gen0 existed, and
    // the later-dropped `price` (id 2) resurfaces its ORIGINAL values
    // — the payoff of the metadata-only drop (bytes never rewritten)
    val v0 = Lakehouse.mappedScan(spark, root, Some(0))
    assert(v0.columns.toSeq == Seq("k", "price", "tag"))
    assert(v0.select($"k", $"price", $"tag")
      .as[(Int, Double, String)].collect().toSeq.sortBy(_._1) ==
      Seq((1, 10.0, "a"), (2, 20.0, "b")),
      "AS OF the pre-drop epoch must resurface the dropped column's values")
    // AS OF v1: the rename applies, the drop applies, gen2 not yet born
    val v1 = Lakehouse.mappedScan(spark, root, Some(1))
    assert(v1.columns.toSeq == Seq("k", "label"))
    assert(v1.select($"k").as[Int].collect().toSeq.sorted == Seq(1, 2, 3),
      "epoch v1 must see exactly generations 0 and 1")
    // an unknown epoch refuses loudly
    val eEpoch = intercept[IllegalArgumentException] {
      Lakehouse.mappedScan(spark, root, Some(9))
    }
    assert(eEpoch.getMessage.contains("no schema epoch"),
      s"unnamed refusal: ${eEpoch.getMessage}")
  }

  test("a current column no generation carries surfaces as a typed null column; unknown stamps refuse") {
    import spark.implicits._
    val root = freshRoot()
    Lakehouse.writeMappedSchema(root, 0, Seq(
      Lakehouse.MappedField(1, "k", "k", "INT")))
    val gen0 = new java.io.File(root, "gen0")
    Seq(1, 2).toDF("k").coalesce(1).write.parquet(gen0.getAbsolutePath)
    Lakehouse.stampMappedGeneration(gen0, 0)
    // v1 adds `w` (id 2, BIGINT) — no generation written under it yet
    Lakehouse.writeMappedSchema(root, 1, Seq(
      Lakehouse.MappedField(1, "k", "k", "INT"),
      Lakehouse.MappedField(2, "w", "w", "BIGINT")))
    val scan = Lakehouse.mappedScan(spark, root)
    assert(scan.columns.toSeq == Seq("k", "w"))
    assert(scan.schema("w").dataType ==
      org.apache.spark.sql.types.LongType,
      s"never-written column must carry its DECLARED type, got " +
        s"${scan.schema("w").dataType}")
    assert(scan.filter(col("w").isNotNull).count() == 0)

    // an unknown schema stamp is a named refusal, not a silent misread
    val genX = new java.io.File(root, "gen9")
    Seq(9).toDF("k").coalesce(1).write.parquet(genX.getAbsolutePath)
    Lakehouse.stampMappedGeneration(genX, 7)
    val e = intercept[IllegalArgumentException] {
      Lakehouse.mappedScan(spark, root).count()
    }
    assert(e.getMessage.contains("unknown schema"),
      s"unnamed refusal: ${e.getMessage}")
  }

  test("ADVICE r17: a generation whose every field id was later dropped " +
    "still contributes all-null rows — row counts survive a " +
    "drop-everything evolution") {
    import spark.implicits._
    val root = freshRoot()
    Lakehouse.writeMappedSchema(root, 0, Seq(
      Lakehouse.MappedField(1, "k", "k", "INT")))
    val gen0 = new java.io.File(root, "gen0")
    Seq(1, 2, 3).toDF("k").coalesce(1).write.parquet(gen0.getAbsolutePath)
    Lakehouse.stampMappedGeneration(gen0, 0)
    // v1 drops id 1 and adds a fresh id 2 — gen0 carries NO current id
    Lakehouse.writeMappedSchema(root, 1, Seq(
      Lakehouse.MappedField(2, "w", "w", "BIGINT")))
    val gen1 = new java.io.File(root, "gen1")
    Seq(10L).toDF("w").coalesce(1).write.parquet(gen1.getAbsolutePath)
    Lakehouse.stampMappedGeneration(gen1, 1)
    val scan = Lakehouse.mappedScan(spark, root)
    assert(scan.columns.toSeq == Seq("w"))
    // Delta/Iceberg surface gen0's rows as all-null, not as vanished
    assert(scan.count() == 4,
      "drop-everything evolution silently elided a generation's rows")
    assert(scan.filter(col("w").isNull).count() == 3)
    assert(scan.filter(col("w") === 10L).count() == 1)
  }
}
