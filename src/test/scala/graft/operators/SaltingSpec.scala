package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Salting parity: the two-phase salted forms must produce exactly the
  * direct results on a deliberately skewed dataset (90% one hot key).
  */
class SaltingSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val skewed = spark.range(0, 100000)
    .select(
      when($"id" % 10 =!= 0, lit(42L)).otherwise($"id" % 97).as("k"),
      ($"id" % 1000).cast("double").as("v"))

  test("salted two-phase aggregation equals the direct aggregation") {
    val direct = skewed.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Salting.saltedCountSum(skewed, $"k", $"v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
    assert(direct.exists { case (k, n, _) => k == 42L && n >= 90000L }) // skew is real
  }

  test("salted join equals the direct join on a hot probe key") {
    val build = Seq((42L, "hot"), (1L, "a"), (7L, "b")).toDF("k", "name")
    val direct = skewed.join(build, "k")
      .groupBy($"name").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Salting.saltedJoin(skewed, build, "k")
      .groupBy($"name").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == direct)
    assert(direct.exists { case (name, n) => name == "hot" && n >= 90000L })
  }
}
