package graft.tools

import graft.engine._
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-level attribution for the q_winnow_pairs shape —
  * where do the ~55 task-seconds go (index build, candidate join fanout,
  * pair aggregation, spill)? */
object WinnowStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.hugeMethodLimit", GraftSession.hugeMethodLimit)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var lines = List.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null && m.executorRunTime > 200) {
          lines ::= f"stage ${s.stageInfo.stageId}%3d ${s.stageInfo.name.takeWhile(_ != '(')}%-24s " +
            f"tasks=${s.stageInfo.numTasks}%3d time=${m.executorRunTime / 1000.0}%6.1fs " +
            f"spillMem=${m.memoryBytesSpilled / 1048576}%5dMB spillDisk=${m.diskBytesSpilled / 1048576}%5dMB " +
            f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1048576}%5dMB " +
            f"outRows=${m.shuffleWriteMetrics.recordsWritten}%10d peak=${m.peakExecutionMemory / 1048576}%5dMB"
        }
      }
    })

    val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val corpus = TextOps.withMutatedTwins(d, "doc_id", "text")

    import org.apache.spark.sql.DataFrame
    def candidateBase(minShared: Int, maxBucket: Int): (DataFrame, DataFrame) = {
      val inv = TextOps.winnowingFingerprints(corpus, "doc_id", "text")
        .select(col("id"), explode(col("fingerprints")).as("f"))
      val small = inv.groupBy("f").agg(count(lit(1)).as("_n"))
        .where(col("_n") <= maxBucket).select("f")
      val pruned = inv.join(small, Seq("f"))
        .repartition(col("f"))
        .persistTracked()
      val joined = pruned.select(col("f"), col("id").as("id_a"))
        .join(pruned.select(col("f"), col("id").as("id_b")), Seq("f"))
        .where(col("id_a") < col("id_b"))
      (pruned, joined)
    }
    def current(minShared: Int, maxBucket: Int): DataFrame = {
      val (_, joined) = candidateBase(minShared, maxBucket)
      joined.groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
        .where(col("shared") >= minShared)
        .orderBy("id_a", "id_b")
    }
    def repartFirst(minShared: Int, maxBucket: Int): DataFrame = {
      val (_, joined) = candidateBase(minShared, maxBucket)
      joined.select("id_a", "id_b")
        .repartition(col("id_a"), col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
        .where(col("shared") >= minShared)
        .orderBy("id_a", "id_b")
    }
    def windowed(minShared: Int, maxBucket: Int): DataFrame = {
      val (_, joined) = candidateBase(minShared, maxBucket)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("id_a", "id_b")
      joined.select(col("id_a"), col("id_b"))
        .withColumn("shared", count(lit(1)).over(w))
        .where(col("shared") >= minShared)
        .dropDuplicates("id_a", "id_b")
        .orderBy("id_a", "id_b")
    }

    def run(tag: String, df: => DataFrame): Unit = {
      lines = Nil
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[$tag] wall=${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      Thread.sleep(500)
      lines.reverse.foreach(l => println(s"[$tag] $l"))
      Caches.releaseAll()
    }
    run("current-warm", current(8, 512))
    run("current", current(8, 512))
    run("repart-warm", repartFirst(8, 512))
    run("repart", repartFirst(8, 512))
    run("window-warm", windowed(8, 512))
    run("window", windowed(8, 512))
    // equality check
    val a = current(8, 512).collect().map(_.toSeq).toSet
    Caches.releaseAll()
    val b = repartFirst(8, 512).collect().map(_.toSeq).toSet
    Caches.releaseAll()
    val c = windowed(8, 512).collect().map(r => Seq(r.get(0), r.get(1), r.get(2))).toSet
    Caches.releaseAll()
    println(s"equal repart=${a == b} window=${a == c}")
    spark.stop()
  }
}
