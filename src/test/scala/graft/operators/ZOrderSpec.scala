package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins p7's Morton key: the interleave is a bijection on the masked
  * domain (decode recovers both keys exactly), and delivers the locality
  * the layout exists for — a box query constrained on BOTH keys touches
  * strictly fewer z-buckets than the same box under a linear concat key,
  * which is the file-stats-pruning win a lake clustering pass buys.
  */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def deinterleave(z: Long, bits: Int): (Long, Long) = {
    var x = 0L; var y = 0L
    var i = 0
    while (i < bits) {
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  test("zorderKey is a bijection: decode recovers both keys on a value sweep") {
    // edge values (0, 1, max, max-1, alternating bit patterns) plus a
    // deterministic pseudo-random sweep; evaluated through the real
    // Column expression, not a scala reimplementation
    val mask = (1L << Mixing.ZBits) - 1
    val edges = Seq(0L, 1L, 2L, 3L, mask, mask - 1, 0x155555L, 0x0AAAAAL)
    val sweep = (0 until 200).map(i => (i * 2654435761L) & mask)
    val xs = (edges ++ sweep).distinct
    val rows = xs.flatMap(x => Seq((x, (x * 40503L) & mask), (x, x), ((x * 7L) & mask, x)))
    val got = rows.toDF("x", "y")
      .withColumn("z", Mixing.zorderKey($"x", $"y", Mixing.ZBits))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(deinterleave(z, Mixing.ZBits) == ((x, y)),
        s"z=$z did not decode back to ($x, $y)")
    }
  }

  test("z-layout touches fewer buckets than linear layout for a square box") {
    // 64×64 key grid bucketed into 64 ranges of the layout key. A 8×8
    // box constrained on both dims: under z-order the box is covered by
    // a handful of contiguous z-ranges; under the linear key (x<<6|y)
    // every x-slice of the box lands in a different bucket.
    val bits = 6
    val grid = spark.range(0, 64L * 64L)
      .select((col("id") / 64).cast("long").as("x"), (col("id") % 64).cast("long").as("y"))
    val keyed = grid
      .withColumn("zkey", Mixing.zorderKey(col("x"), col("y"), bits))
      .withColumn("linkey", shiftleft(col("x"), bits) + col("y"))
      // 64 equal-width buckets of each 12-bit layout key
      .withColumn("zbucket", shiftright(col("zkey"), 2 * bits - 6))
      .withColumn("linbucket", shiftright(col("linkey"), 2 * bits - 6))
    val box = keyed.filter(col("x").between(8, 15) && col("y").between(8, 15))
    val zTouched = box.select("zbucket").distinct().count()
    val linTouched = box.select("linbucket").distinct().count()
    // the 8×8 box at an aligned corner is exactly ONE aligned z-quadrant
    assert(zTouched == 1, s"z-order box touched $zTouched buckets")
    assert(linTouched == 8, s"linear box should touch one bucket per x-slice, got $linTouched")
  }

  test("zorderSqlExpr and zorderKey agree (the oracle replays the exact bijection)") {
    val mask = (1L << Mixing.ZBits) - 1
    val vals = (0 until 64).map(i => ((i * 2654435761L) & mask, (i * 40503L) & mask))
    val df = vals.toDF("x", "y")
    df.createOrReplaceTempView("zorder_probe")
    val viaSql = spark.sql(
      s"SELECT x, y, ${Mixing.zorderSqlExpr("x", "y", Mixing.ZBits)} AS z FROM zorder_probe")
    val viaCol = df.withColumn("z", Mixing.zorderKey($"x", $"y", Mixing.ZBits))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty,
      "SQL-generated z expression diverges from the Column form")
  }
}
