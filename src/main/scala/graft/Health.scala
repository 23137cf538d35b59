package graft

import org.apache.spark.sql.SparkSession

/** O22 liveness/readiness probes (reference main.py:33-47: HTTP liveness
  * plus a broker-connectivity readiness check with a bounded budget).
  * Spark-side: liveness = the SQL engine answers SELECT 1; readiness =
  * liveness AND at least one executor is registered with the scheduler
  * (the analog of "a worker is reachable through the broker").
  */
object Health {

  /** Liveness: the session plans and executes a trivial query. */
  def ping(spark: SparkSession): Boolean =
    try spark.sql("SELECT 1").collect().headOption.exists(_.getInt(0) == 1)
    catch { case _: Exception => false }

  /** Readiness: live AND executors registered (statusTracker — in local
    * mode the driver itself is the one executor). */
  def ready(spark: SparkSession): Boolean =
    try ping(spark) && spark.sparkContext.statusTracker.getExecutorInfos.nonEmpty
    catch { case _: Exception => false }
}
