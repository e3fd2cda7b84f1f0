package graft.streaming

import graft.engine.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming exactly-once sink behavior: a file-source → validated-stream →
  * parquet-sink query with a checkpointLocation is stopped and restarted;
  * rows arriving while the query is down are picked up exactly once. This is
  * the Structured-Streaming face of the north rule's resumability. */
class StreamingRestartSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("file-source validation stream restarts from its checkpoint exactly once") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-stream-in").toString
    val outDir = Files.createTempDirectory("graft-stream-out").toString
    val cpDir = Files.createTempDirectory("graft-stream-cp").toString

    def writeBatch(name: String, ids: Seq[Long]): Unit =
      ids.map(i => (i, s"text for doc $i")).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(inDir)

    writeBatch("b1", 1L to 20L)

    def startQuery() = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .parquet(inDir)
      val validated = StreamingChecks.validatedStream(
        graft.engine.DocTable.fromBase(stream))
      validated.select("doc_num", "doc_id", "valid")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", cpDir)
        .outputMode("append")
        .start()
    }

    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    val afterFirst = spark.read.parquet(outDir).count()
    assert(afterFirst === 20)

    // rows arrive while the query is down
    writeBatch("b2", 21L to 117L) // includes 97 (zero spans → invalid)

    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() === 117, "restart must process the gap exactly once")
    assert(out.select("doc_num").distinct().count() === 117, "no duplicates")
    val invalid = out.where(!col("valid")).select("doc_num").collect().map(_.getLong(0)).toSet
    assert(invalid.contains(97L), s"doc 97 (zero spans) must be invalid, got $invalid")
  }
}
