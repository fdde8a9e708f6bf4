package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Dev tool: run named registered queries repeatedly and report the task
  * metrics wall-clock alone can't separate — shuffle spill (memory +
  * disk), GC time, shuffle bytes read/written, peak execution memory —
  * so a run-to-run time spread can be adjudicated as SPILL (structural:
  * partitions too big for the fraction of executor memory the run got)
  * vs HOST NOISE (same metrics, different wall-clock). Built for the
  * round-11 verdict's q_triangles sf1 question and the dup-span drift
  * adjudication; general over any registered query.
  *
  * Run: `sbt "runMain graft.QueryMetricsProbe <sfDir> <q1,q2> [runs]"`.
  * One PROBE line per (query, run): wall seconds + the aggregated
  * metrics for exactly that run's jobs. Listener events are posted
  * ASYNC on the bus; between runs the probe blocks on the bus drain
  * (`waitUntilEmpty` via [[org.apache.spark.GraftListenerBusDrain]])
  * so a late task-end event can never be attributed to the next run.
  */
object QueryMetricsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.create(appName = "graft-qmetrics")
    spark.sparkContext.setLogLevel("ERROR")

    val spillMem = new LongAdder; val spillDisk = new LongAdder
    val gcMs = new LongAdder; val shufRead = new LongAdder
    val shufWrite = new LongAdder; val peakMem = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spillMem.add(m.memoryBytesSpilled)
          spillDisk.add(m.diskBytesSpilled)
          gcMs.add(m.jvmGCTime)
          shufRead.add(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.add(m.shuffleWriteMetrics.bytesWritten)
          peakMem.accumulateAndGet(m.peakExecutionMemory, math.max)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def mb(x: Long): String = f"${x / 1048576.0}%.1f"

    names.foreach { name =>
      (1 to runs).foreach { i =>
        spillMem.reset(); spillDisk.reset(); gcMs.reset()
        shufRead.reset(); shufWrite.reset(); peakMem.set(0L)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events are posted async: block until the bus has
        // dispatched everything this run queued (deterministic, vs the
        // fixed sleep that mis-attributed slow-arriving events)
        org.apache.spark.GraftListenerBusDrain.drain(spark.sparkContext)
        println(f"PROBE $name run=$i sec=$sec%.2f " +
          s"spill_mem_mb=${mb(spillMem.sum)} spill_disk_mb=${mb(spillDisk.sum)} " +
          s"gc_ms=${gcMs.sum} shuf_read_mb=${mb(shufRead.sum)} " +
          s"shuf_write_mb=${mb(shufWrite.sum)} peak_task_mem_mb=${mb(peakMem.get)}")
      }
    }
    spark.stop()
  }
}
