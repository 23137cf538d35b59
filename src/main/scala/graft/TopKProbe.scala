package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val orders = Tables(spark, dir, "orders")
      .select($"o_orderpriority".as("prio"),
        month($"o_orderdate".cast("date")).as("mon"),
        $"o_orderkey", $"o_totalprice")
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val custom = graft.plans.GroupTopK.topK(orders, Seq("prio", "mon"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 5)
    val w = Window.partitionBy($"prio", $"mon")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val win = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5).drop("rn")
    time("custom")(custom.write.format("noop").mode("overwrite").save())
    time("window")(win.write.format("noop").mode("overwrite").save())
    println("rows: " + custom.count() + " / " + win.count())
    spark.stop()
  }
}
