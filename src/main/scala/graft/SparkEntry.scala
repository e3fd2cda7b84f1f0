package graft

import graft.engine._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — one entry per implemented operator (SURVEY.md §2), with
  * DuckDB-runnable oracle SQL over the same parquet tables.
  *
  * The interleaved doc table (north-rule input shape) is synthesized
  * deterministically from `documents.parquet` ([[graft.engine.DocTable]]);
  * each oracle carries the same synthesis as SQL CTEs so the DuckDB compare
  * is a genuine independent differential test of the Catalyst compiler.
  */
object SparkEntry {

  private def docs(s: SparkSession, dir: String): DataFrame =
    DocTable.docs(s, dir)

  private def verdicts(s: SparkSession, dir: String): DataFrame =
    ValidationJob.withVerdicts(s, docs(s, dir), DocTable.docSchemaJson)

  /** Flagship query on sf=0.001: full validation verdicts. */
  def entry(spark: SparkSession): DataFrame =
    verdicts(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_validate_verdicts" -> ((s, dir) =>
      verdicts(s, dir)
        .select(col("doc_num"), col("doc_id"), col("valid"),
          size(col("errors")).as("n_violations"))
        .orderBy("doc_num")),

    "q_validate_violations" -> ((s, dir) =>
      ValidationJob.violations(verdicts(s, dir))
        .select("doc_num", "path", "keyword")
        .orderBy("doc_num", "path", "keyword")),

    "q_partition_verdicts" -> ((s, dir) =>
      ValidationJob.partitionVerdicts(verdicts(s, dir), col("doc_num"), 32)
        .orderBy("partition")),

    "q_dedup_exact" -> ((s, dir) =>
      Checks.duplicateKeys(docs(s, dir), "doc_id")),

    "q_refcheck_dangling" -> ((s, dir) =>
      Checks.danglingRefs(
        docs(s, dir).select(explode(col("spans")).as("span"))
          .select(col("span.media_ref").as("media_ref")),
        "media_ref",
        DocTable.mediaCatalog(s), "media_ref")),

    "q_stats_profile" -> ((s, dir) =>
      Checks.profile(
        s.read.parquet(s"$dir/events.parquet"),
        Seq("value", "user_id", "event_type"))),

    "q_drift_bins" -> ((s, dir) =>
      Checks.driftBins(
        s.read.parquet(s"$dir/events.parquet"),
        "value", col("event_id") % 2 === 0, 10.0)),

    // drift scores over the binned counts; rounded so the rows are stable.
    // No oracleSql entry: PSI/KS are engine-side scalar reductions (driver
    // records a rows-only check).
    "q_drift_scores" -> ((s, dir) => {
      val bins = Checks.driftBins(
        s.read.parquet(s"$dir/events.parquet"),
        "value", col("event_id") % 2 === 0, 50.0).collect()
      val ref = bins.map(_.getAs[Long]("ref_count")).toSeq
      val cur = bins.map(_.getAs[Long]("cur_count")).toSeq
      import s.implicits._
      Seq(
        ("psi", math.rint(Drift.psi(ref, cur) * 1e6) / 1e6),
        ("ks", math.rint(Drift.ks(ref, cur) * 1e6) / 1e6)
      ).toDF("measure", "score").orderBy("measure")
    })
  )

  /** DuckDB mirrors. Column names must match the Spark outputs exactly. */
  def oracleSql: Map[String, String] = {
    val W = DocTable.sqlWith
    Map(
      "q_validate_verdicts" ->
        s"""$W, span_viol AS (
           |  SELECT doc_num, SUM(CASE WHEN kind = 'imag' THEN 1 ELSE 0 END)
           |                + SUM(CASE WHEN "offset" < 0 THEN 1 ELSE 0 END) AS sviol
           |  FROM gspans GROUP BY doc_num)
           |SELECT d.doc_num, d.doc_id_str AS doc_id,
           |  (nv.n = 0) AS valid, CAST(nv.n AS INTEGER) AS n_violations
           |FROM gdocs d
           |LEFT JOIN span_viol s USING (doc_num),
           |LATERAL (SELECT (CASE WHEN regexp_matches(d.doc_id_str, '^doc-[0-9]+$$') THEN 0 ELSE 1 END)
           |              + (CASE WHEN d.n_spans < 1 THEN 1 ELSE 0 END)
           |              + COALESCE(s.sviol, 0) AS n) nv
           |ORDER BY d.doc_num""".stripMargin,

      "q_validate_violations" ->
        s"""$W
           |SELECT doc_num, path, keyword FROM (
           |  SELECT doc_num, '/doc_id' AS path, 'pattern' AS keyword
           |    FROM gdocs WHERE NOT regexp_matches(doc_id_str, '^doc-[0-9]+$$')
           |  UNION ALL
           |  SELECT doc_num, '/spans', 'minItems' FROM gdocs WHERE n_spans < 1
           |  UNION ALL
           |  SELECT doc_num, '/spans/' || idx || '/kind', 'enum' FROM gspans WHERE kind = 'imag'
           |  UNION ALL
           |  SELECT doc_num, '/spans/' || idx || '/offset', 'minimum' FROM gspans WHERE "offset" < 0
           |) ORDER BY doc_num, path, keyword""".stripMargin,

      "q_partition_verdicts" ->
        s"""$W, span_viol AS (
           |  SELECT doc_num, SUM(CASE WHEN kind = 'imag' THEN 1 ELSE 0 END)
           |                + SUM(CASE WHEN "offset" < 0 THEN 1 ELSE 0 END) AS sviol
           |  FROM gspans GROUP BY doc_num),
           |doc_v AS (
           |  SELECT d.doc_num,
           |    (CASE WHEN regexp_matches(d.doc_id_str, '^doc-[0-9]+$$') THEN 0 ELSE 1 END)
           |    + (CASE WHEN d.n_spans < 1 THEN 1 ELSE 0 END)
           |    + COALESCE(s.sviol, 0) AS n
           |  FROM gdocs d LEFT JOIN span_viol s USING (doc_num))
           |SELECT CAST(doc_num % 32 AS INTEGER) AS partition,
           |  COUNT(*) AS docs,
           |  SUM(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS pass_count,
           |  SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS fail_count,
           |  SUM(n) AS violation_count
           |FROM doc_v GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_dedup_exact" ->
        s"""$W
           |SELECT doc_id_str AS doc_id, COUNT(*) AS cnt
           |FROM gdocs GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY 1""".stripMargin,

      "q_refcheck_dangling" ->
        s"""$W
           |SELECT media_ref AS ref, COUNT(*) AS ref_count
           |FROM gspans
           |WHERE media_ref IS NOT NULL
           |  AND CAST(substr(media_ref, 3) AS INTEGER) >= 200
           |GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_stats_profile" ->
        """SELECT * FROM (
          |  SELECT 'event_type' AS "column", COUNT(*) AS total_count,
          |    SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS null_count,
          |    CAST(NULL AS DOUBLE) AS min_value, CAST(NULL AS DOUBLE) AS max_value,
          |    COUNT(DISTINCT event_type) AS distinct_count FROM events
          |  UNION ALL
          |  SELECT 'user_id', COUNT(*),
          |    SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END),
          |    MIN(CAST(user_id AS DOUBLE)), MAX(CAST(user_id AS DOUBLE)),
          |    COUNT(DISTINCT user_id) FROM events
          |  UNION ALL
          |  SELECT 'value', COUNT(*),
          |    SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END),
          |    MIN(value), MAX(value), COUNT(DISTINCT value) FROM events
          |) ORDER BY "column"""".stripMargin,

      "q_drift_bins" ->
        """SELECT CAST(FLOOR(value / 10.0) AS INTEGER) AS bin,
          |  SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS ref_count,
          |  SUM(CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END) AS cur_count
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
    )
  }
}
