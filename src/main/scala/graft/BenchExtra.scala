package graft

import graft.engine.{DocTable, ValidationJob}
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only measurement harness for the optimization rounds (the frozen
  * [[Bench]] is the driver contract and cannot grow flags). Times the SAME
  * queries with the SAME session shape and action as Bench's query pass,
  * but adds the instrumentation the optimization guide (§1) calls for:
  *
  *   - per-query scheduler metrics (jobs, stages, tasks, task-time,
  *     shuffle bytes) via a SparkListener, so "where does the time go" is a
  *     number, not a guess;
  *   - `--repeat N` for steady-state comparisons (Bench times each query
  *     once, cold);
  *   - `--explain <dir> <suffix>` dumps `.explain("formatted")` per query
  *     (the plans/r06 artifacts);
  *   - `--action noop` isolates computation from the count() action with
  *     the noop sink (guide §1.4);
  *   - trailing query names restrict the set (dev loop).
  *
  * Never used by the driver; BENCH numbers quoted in OPTIMIZATION_r06.md
  * cite which harness produced them.
  */
object BenchExtra {

  private final class QueryMetrics extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val shuffleRead = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        taskTimeMs.addAndGet(m.executorRunTime)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
      tasks.addAndGet(s.stageInfo.numTasks)
      ()
    }
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0)
      taskTimeMs.set(0); shuffleWrite.set(0); shuffleRead.set(0)
    }
    def line: String =
      f"jobs=${jobs.get}%d stages=${stages.get}%d tasks=${tasks.get}%d " +
        f"taskTime=${taskTimeMs.get / 1000.0}%.1fs " +
        f"shufW=${shuffleWrite.get / 1048576.0}%.1fMB shufR=${shuffleRead.get / 1048576.0}%.1fMB"
  }

  def main(args: Array[String]): Unit = {
    var repeat = 1
    var explainDir: Option[(String, String)] = None
    var action = "count"
    val names = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--repeat" => repeat = args(i + 1).toInt; i += 2
        case "--explain" => explainDir = Some((args(i + 1), args(i + 2))); i += 3
        case "--action" => action = args(i + 1); i += 2
        case q => names += q; i += 1
      }
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.hugeMethodLimit", graft.engine.GraftSession.hugeMethodLimit)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new QueryMetrics
    spark.sparkContext.addSparkListener(metrics)

    // same warm-up shape as Bench's query pass
    val docs = DocTable.docs(spark, sfDir)
    ValidationJob.withVerdicts(spark, docs, DocTable.docSchemaJson)
      .agg(count(lit(1))).collect()
    SparkEntry.prepareIndexes(spark, sfDir)

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }

    explainDir.foreach { case (dir, suffix) =>
      new java.io.File(dir).mkdirs()
      queries.foreach { case (name, fn) =>
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/${name}_$suffix.txt"), plan)
        graft.engine.Caches.releaseAll()
      }
      println(s"[bench-extra] wrote ${queries.size} plans to $dir (suffix $suffix)")
    }

    for (r <- 1 to repeat) {
      val times = queries.map { case (name, fn) =>
        metrics.reset()
        spark.sparkContext.setJobDescription(name)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        action match {
          case "noop" => df.write.format("noop").mode("overwrite").save()
          case _ => df.count()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.setJobDescription(null)
        graft.engine.Caches.releaseAll()
        // listener events arrive on the async bus — give it a moment to
        // drain so metrics attribute to THIS query, not the next one
        // (does not affect `secs`, which is already taken)
        Thread.sleep(300)
        println(f"[run$r] $name%-28s ${secs}%7.3fs  ${metrics.line}")
        name -> secs
      }
      println(f"[run$r] TOTAL ${times.map(_._2).sum}%.3f s (${times.size} queries, action=$action)")
    }
    spark.stop()
  }
}
