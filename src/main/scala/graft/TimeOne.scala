package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time ONE registered query (same noop-sink methodology as
  * [[Bench]]) without paying the full 61-query sweep — for plan/perf
  * iteration on a single operator. Usage:
  * `sbt "runMain graft.TimeOne <query> [sfDir] [iters]"`.
  *
  * With `SPARK_GRAFT_MEMPROBE=1` a sampler thread additionally records,
  * at 100 ms resolution: peak cached-RDD storage (mem + disk bytes and
  * block-owner count — for the iterative families this IS the per-round
  * localCheckpoint footprint) and peak JVM heap. The storage peak is the
  * number SCALING.md's memory-telemetry rows cite: for pointer-jumping
  * CC it answers "do the per-round checkpoints accumulate, or stay
  * bounded at ~active-round size?" with a measurement. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_SHUFFLE: partition-count override for beyond-sf10
    // probes — the prompt's own sizing rule (partitions must fit the
    // executor heap at the target SF): g8's 3.3B-pair shuffle at sf30
    // OOMs 32 partitions on an 8g heap; 128+ spills and completes.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // SPARK_GRAFT_EXTRACONF: "k=v;k=v" session-conf overrides for
    // A/B probes (e.g. spark.sql.adaptive.enabled=false) — dev only.
    val extra = sys.env.getOrElse("SPARK_GRAFT_EXTRACONF", "")
      .split(";").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val spark = extra.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      // pack parallel file-status listing jobs (see Bench.scala note)
      .config("spark.sql.sources.parallelPartitionDiscovery.parallelism",
        (cpus.toInt * 2).toString)
      .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench: scan footers + one shuffle
    Tables.names.foreach { t =>
      Tables(spark, sfDir, t).write.format("noop").mode("overwrite").save()
    }
    val probe = sys.env.get("SPARK_GRAFT_MEMPROBE").exists(_.nonEmpty)
    (1 to iters).foreach { i =>
      @volatile var sampling = true
      @volatile var peakStorage = 0L
      @volatile var peakRdds = 0
      @volatile var peakHeap = 0L
      val sampler = if (probe) {
        val t = new Thread(() => {
          val rt = Runtime.getRuntime
          // swallow shutdown races: if the measured query throws, the
          // context can stop while this daemon thread is mid-poll — the
          // probe must never mask the query's own failure
          try while (sampling) {
            val info = spark.sparkContext.getRDDStorageInfo
            val bytes = info.map(x => x.memSize + x.diskSize).sum
            if (bytes > peakStorage) peakStorage = bytes
            if (info.length > peakRdds) peakRdds = info.length
            val heap = rt.totalMemory() - rt.freeMemory()
            if (heap > peakHeap) peakHeap = heap
            Thread.sleep(100)
          } catch { case _: Throwable => () }
        }, "graft-memprobe")
        t.setDaemon(true); t.start(); Some(t)
      } else None
      // Streaming-state telemetry (round 12): st* queries keep their
      // working set in the STATE STORE, which the RDD-storage sampler
      // above reads as zero — the number SCALING.md needs for "state
      // pins at the watermark horizon" is the state operators' own
      // memoryUsedBytes, reported per micro-batch in the progress
      // events. Peak across all batches and operators.
      @volatile var peakStateBytes = 0L
      @volatile var peakStateRows = 0L
      val listener = if (probe) {
        val l = new org.apache.spark.sql.streaming.StreamingQueryListener {
          override def onQueryStarted(
              e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
          override def onQueryProgress(
              e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
            val ops = e.progress.stateOperators
            if (ops != null && ops.nonEmpty) {
              val bytes = ops.map(_.memoryUsedBytes).sum
              val rows = ops.map(_.numRowsTotal).sum
              if (bytes > peakStateBytes) peakStateBytes = bytes
              if (rows > peakStateRows) peakStateRows = rows
            }
          }
          override def onQueryTerminated(
              e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        }
        spark.streams.addListener(l)
        Some(l)
      } else None
      // Task-count telemetry (round 14, d24 diagnosis): many SMALL tasks
      // make a query's wall hypersensitive to background load — each
      // descheduling stalls a whole wave when task time ~ scheduler
      // quantum. SPARK_GRAFT_TASKPROBE=1 counts tasks/stages/jobs and
      // sums task time so amplification claims carry numbers.
      val taskProbe = sys.env.get("SPARK_GRAFT_TASKPROBE").exists(_.nonEmpty)
      val taskCount = new java.util.concurrent.atomic.AtomicLong()
      val taskTimeMs = new java.util.concurrent.atomic.AtomicLong()
      val stageCount = new java.util.concurrent.atomic.AtomicLong()
      val jobCount = new java.util.concurrent.atomic.AtomicLong()
      val stageTimeMs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      val taskListener = if (taskProbe) {
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            taskCount.incrementAndGet()
            taskTimeMs.addAndGet(e.taskInfo.duration)
            stageTimeMs.merge(e.stageId, e.taskInfo.duration, Long.box(_) + _)
            ()
          }
          override def onStageCompleted(
              e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            stageCount.incrementAndGet()
            val info = e.stageInfo
            if (info.numTasks > 31) System.err.println(
              s"[timeone]   hot stage ${info.stageId} (parents ${info.parentIds.mkString(",")}): ${info.numTasks} tasks, " +
                f"${stageTimeMs.getOrDefault(info.stageId, 0L) / 1000.0}%.1f s task-time — " +
                info.name.take(100) + " :: " + info.details.linesIterator.take(14).mkString(" | "))
            ()
          }
          override def onJobStart(
              e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            if (sys.env.contains("SPARK_GRAFT_JOBPROBE")) System.err.println(
              s"[timeone]   job ${e.jobId} stages=${e.stageInfos.map(s => s"${s.stageId}(${s.numTasks})").mkString(",")} — " +
                e.stageInfos.headOption.map(_.name.take(120)).getOrElse(""))
            ()
          }
          override def onJobEnd(
              e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            jobCount.incrementAndGet(); ()
          }
        }
        spark.sparkContext.addSparkListener(l)
        Some(l)
      } else None
      if (taskProbe) graft.streaming.StreamQueries.lastRunProgress = null
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write
        .format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      sampling = false
      sampler.foreach(_.join())
      listener.foreach(spark.streams.removeListener)
      // Streaming floor decomposition (round 14, st9): the catch-up
      // runners stash recentProgress — print each micro-batch's phase
      // durations so "per-trigger floor vs work" carries numbers.
      if (taskProbe) {
        val prog = graft.streaming.StreamQueries.lastRunProgress
        if (prog != null) prog.foreach { p =>
          val d = p.durationMs
          System.err.println(
            s"[timeone] $name batch ${p.batchId}: rows=${p.numInputRows} " +
              s"trigger=${d.get("triggerExecution")}ms " +
              s"getBatch=${d.get("getBatch")}ms " +
              s"addBatch=${d.get("addBatch")}ms " +
              s"latestOffset=${d.get("latestOffset")}ms " +
              s"commit=${d.get("commitOffsets")}ms " +
              s"walCommit=${d.get("walCommit")}ms")
        }
      }
      taskListener.foreach { l =>
        Thread.sleep(500) // listener bus drains asynchronously
        spark.sparkContext.removeSparkListener(l)
        val n = taskCount.get()
        System.err.println(
          f"[timeone] $name iter $i tasks: $n%d tasks / " +
            f"${stageCount.get()}%d stages / ${jobCount.get()}%d jobs, " +
            f"task-time ${taskTimeMs.get() / 1000.0}%.1f s " +
            f"(mean ${if (n > 0) taskTimeMs.get().toDouble / n else 0.0}%.1f ms/task)")
      }
      spark.catalog.clearCache()
      System.err.println(f"[timeone] $name iter $i: $dt%.2f s")
      if (probe) System.err.println(
        f"[timeone] $name iter $i mem: peak cached storage " +
          f"${peakStorage / 1048576.0}%.1f MiB across $peakRdds%d RDDs, " +
          f"peak heap ${peakHeap / 1073741824.0}%.2f GiB" +
          (if (peakStateBytes > 0)
            f", peak streaming state ${peakStateBytes / 1048576.0}%.1f MiB / $peakStateRows%d rows"
          else ""))
    }
    spark.stop()
  }
}
