package graft.engine.sources

import graft.engine.{DocTable, ParquetSnapshotTable, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The DSv2 face of the snapshot table: registration by short name,
  * latest-snapshot resolution, pinned time travel, and — because the scan
  * delegates to Spark's own parquet V2 machinery — partition pruning on
  * the bucket directory column and column pruning at the scan. */
class GraftSnapshotSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val root: String = {
    val r = tmp("graft-dsv2")
    val docs = DocTable.docs(spark, sfDir)
    ParquetSnapshotTable.materialize(docs, r, "s1", "doc_id", 8)
    // second snapshot with fewer rows — distinguishable from s1
    ParquetSnapshotTable.materialize(
      docs.where(col("doc_num") % 2 === 0), r, "s2", "doc_id", 8)
    r
  }

  test("format(graft-snapshot) resolves by short name and reads the LATEST snapshot") {
    val df = spark.read.format("graft-snapshot").option("root", root).load()
    val docs = DocTable.docs(spark, sfDir)
    assert(df.count() === docs.where(col("doc_num") % 2 === 0).count()) // s2 is latest
    assert(GraftSnapshotSource.snapshots(root) === Seq("s1", "s2"))
  }

  test("snapshot option pins time travel; unknown snapshot and missing root fail loudly") {
    val s1 = spark.read.format("graft-snapshot")
      .option("root", root).option("snapshot", "s1").load()
    val docs = DocTable.docs(spark, sfDir)
    assert(s1.count() === docs.count())
    // identical content, not just counts
    assert(s1.select("doc_num").except(docs.select("doc_num")).count() === 0)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshot")
        .option("root", root).option("snapshot", "nope").load()
    }
    assert(e.getMessage.contains("available: s1, s2"))
    intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshot").load() // no root
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshot").option("root", tmp("empty")).load()
    }
  }

  test("bucket filter prunes partitions and projection prunes the read schema") {
    val df = spark.read.format("graft-snapshot")
      .option("root", root).option("snapshot", "s1").load()
    val one = df.where(col("bucket") === 3).select("doc_num")
    val direct = ParquetSnapshotTable.readAll(
      spark, graft.engine.TableSnapshot(root, "s1", 8))
      .where(col("bucket") === 3)
    assert(one.count() === direct.count() && one.count() > 0)
    val plan = one.queryExecution.executedPlan.toString
    // the delegated parquet V2 scan reports bucket only as a partition
    // filter (directory pruning), and reads only the projected column
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan.take(800))
    assert(plan.contains("ReadSchema: struct<doc_num:bigint>"), plan.take(800))
  }
}
