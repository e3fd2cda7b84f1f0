package graft.engine.sources

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 face of the snapshot table layer
  * ([[graft.engine.ParquetSnapshotTable]]): `spark.read
  * .format("graft-snapshot").option("root", r)[.option("snapshot", id)]
  * .load()`. Snapshot resolution (latest by manifest order when
  * unpinned — the time-travel default of an Iceberg-style table) and
  * manifest validation live here; the SCAN delegates to Spark's own V2
  * `ParquetTable` over the resolved snapshot directory, so predicate
  * pushdown, partition pruning on the `bucket` directory column,
  * column pruning and the vectorized reader are all inherited rather
  * than reimplemented — the "compose existing machinery before writing
  * a custom SparkPlan" rule applied to a source. Read-only by design:
  * writes go through [[graft.engine.ParquetSnapshotTable.materialize]],
  * which owns the bucket layout + manifest commit protocol.
  *
  * Options: `root` (required), `snapshot` (optional — defaults to the
  * lexicographically greatest manifest id, i.e. the newest snapshot
  * under sortable id schemes like zero-padded counters or ISO stamps). */
final class GraftSnapshotSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  override def supportsExternalMetadata(): Boolean = false

  private def resolveDir(options: CaseInsensitiveStringMap): String = {
    val root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        "graft-snapshot requires .option(\"root\", <table root>)"))
    val snap = Option(options.get("snapshot")).getOrElse {
      val ids = GraftSnapshotSource.snapshots(root)
      if (ids.isEmpty) throw new IllegalArgumentException(
        s"no _graft_manifest_*.json under $root — not a graft snapshot table")
      ids.last
    }
    if (!Files.exists(Paths.get(s"$root/_graft_manifest_$snap.json")))
      throw new IllegalArgumentException(
        s"snapshot '$snap' has no manifest under $root " +
          s"(available: ${GraftSnapshotSource.snapshots(root).mkString(", ")})")
    s"$root/snapshot=$snap"
  }

  private def delegate(options: CaseInsensitiveStringMap): ParquetTable =
    ParquetTable("graft-snapshot", SparkSession.active, options,
      Seq(resolveDir(options)), None, classOf[ParquetFileFormat])

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    delegate(options).schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    delegate(new CaseInsensitiveStringMap(properties))
}

object GraftSnapshotSource {
  /** Snapshot ids present under `root`, ascending — the listing face of
    * the manifest protocol (last = the unpinned read's default). */
  def snapshots(root: String): Seq[String] = {
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      // Files.list holds a directory handle until closed — resolveDir can
      // call this twice per failed lookup, so an unclosed stream leaks fds
      val s = Files.list(dir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("_graft_manifest_") && n.endsWith(".json"))
        .map(n => n.stripPrefix("_graft_manifest_").stripSuffix(".json"))
        .toSeq.sorted
      finally s.close()
    }
  }
}
