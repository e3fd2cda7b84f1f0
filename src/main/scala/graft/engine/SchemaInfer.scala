package graft.engine

import graft.json.{JArr, JBool, JNum, JObj, JStr, JVal, Json}
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Constraint suggestion: profile a typed corpus and emit the draft-7
  * schema document it already satisfies — the inverse of the validator,
  * closing the loop between the stats engine ([[Checks.profile]]) and
  * [[graft.validate.Validator]]. The reference has no counterpart (jinx
  * only checks schemas, `validate.cljc`); this is the operation a
  * large-scale pipeline needs to BOOTSTRAP those checks: infer the contract
  * from a trusted snapshot, then validate every later snapshot against it
  * (drift in structure surfaces as violations, complementing the
  * distribution drift of [[Checks.ksDrift]]).
  *
  * Scale shape: ONE aggregate pass per nesting frame (the root frame plus
  * one exploded frame per array path — depth-bounded by the schema, not the
  * data). Every metric is partial-aggregable, so map-side combine applies
  * and each shuffle carries one row per partition. The only driver-side
  * materialization is one evidence row per schema path plus ≤ [[enumMax]]
  * values per flagged enum column.
  *
  * Inference rules (deterministic, each SQL-expressible — the DuckDB
  * oracles `q_infer_lineitem` / `q_infer_docs` recompute them):
  *  - JSON type from the Spark type; floating/decimal columns narrow to
  *    `integer` when every non-null value is whole (`x % 1 = 0`)
  *  - `required` = no NULLs seen (within the field's own nesting frame);
  *    a NULL-able leaf gets type `[t, "null"]`
  *  - numeric `minimum`/`maximum`; string `minLength`/`maxLength`
  *    (chars); array `minItems`/`maxItems`
  *  - string `enum` when 1 ≤ distinct ≤ [[enumMax]]
  *  - `format`: `date`/`date-time` for date/timestamp Spark types;
  *    `date` for string columns whose every non-null value matches the
  *    ISO date shape
  */
object SchemaInfer {

  val enumMax = 16
  private val dateRx = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"

  /** Delimiter-safe encoding of a single enum value for the '|'-joined
    * evidence CSV: '\' → '\\', '|' → '\|'. Injective, so set comparisons
    * over escaped tokens are set comparisons over values. */
  private[engine] def escapeEnumValue(v: String): String = {
    val sb = new java.lang.StringBuilder(v.length + 4)
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '\\' || c == '|') sb.append('\\')
      sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Split a '|'-joined evidence CSV into its ESCAPED tokens, honoring the
    * [[escapeEnumValue]] encoding (a backslash escapes the next char, so an
    * escaped '|' never splits). Inverse of the finish-side join; tokens stay
    * escaped — comparisons only need injectivity, not the raw value. */
  private[engine] def splitEnumValues(joined: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < joined.length) {
      val c = joined.charAt(i)
      if (c == '\\' && i + 1 < joined.length) {
        sb.append(c).append(joined.charAt(i + 1)); i += 2
      } else if (c == '|') {
        out += sb.toString; sb.setLength(0); i += 1
      } else { sb.append(c); i += 1 }
    }
    out += sb.toString
    out.result()
  }

  /** UTF-8 byte order — what Spark's own string comparison (and therefore
    * the `array_sort` this aggregate replaced) uses; Java's natural String
    * order differs on supplementary characters. */
  private object Utf8Order extends java.util.Comparator[String] with Serializable {
    def compare(a: String, b: String): Int = {
      val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(ab.length, bb.length)
      var i = 0
      while (i < n) {
        val c = (ab(i) & 0xff) - (bb(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      ab.length - bb.length
    }
  }

  /** [[boundedEnumSet]]'s buffer — public only because Kryo encoding
    * requires it; not API. */
  final case class EnumBuf(var over: Boolean, vals: java.util.HashSet[String])

  /** Size-capped distinct-set aggregate backing the enum evidence. The
    * buffer holds at most [[enumMax]] + 1 distinct values and latches an
    * overflow flag, so profiling a high-cardinality string column (a
    * 10¹²-row free-text column, say) costs a fixed ~17-string buffer —
    * the unbounded `collect_set` it replaces buffered the column's ENTIRE
    * distinct value set per partition before the projection discarded it.
    * Output: the '|'-joined UTF-8-sorted set when distinct ≤ [[enumMax]],
    * NULL on overflow — identical to the old value in every case the
    * evidence projection's `distinct_count BETWEEN 1 AND enumMax` guard
    * lets through. */
  private val boundedEnumSet: UserDefinedFunction = udaf(
    new Aggregator[String, EnumBuf, String] {
      def zero: EnumBuf = EnumBuf(over = false, new java.util.HashSet[String]())
      def reduce(b: EnumBuf, x: String): EnumBuf = {
        if (!b.over && x != null) {
          b.vals.add(x)
          if (b.vals.size > enumMax) { b.over = true; b.vals.clear() }
        }
        b
      }
      def merge(a: EnumBuf, b: EnumBuf): EnumBuf = {
        if (a.over || b.over) { a.over = true; a.vals.clear() }
        else {
          a.vals.addAll(b.vals)
          if (a.vals.size > enumMax) { a.over = true; a.vals.clear() }
        }
        a
      }
      def finish(r: EnumBuf): String =
        if (r.over || r.vals.isEmpty) null
        else {
          // delimiter-safe: escape each value ('\'→'\\', '|'→'\|') BEFORE
          // sorting, so the join order is the byte order of the ESCAPED
          // tokens — the only order a SQL mirror constrained to
          // `string_agg(DISTINCT escaped ORDER BY escaped)` can reproduce.
          // Without this, a value containing '|' fragments on the split in
          // contractBreaks' enum-subset test, raising phantom breaks and
          // masking genuinely out-of-contract values.
          val arr = r.vals.toArray(new Array[String](r.vals.size))
            .map(escapeEnumValue)
          java.util.Arrays.sort(arr, Utf8Order)
          arr.mkString("|")
        }
      def bufferEncoder: Encoder[EnumBuf] = Encoders.kryo[EnumBuf]
      def outputEncoder: Encoder[String] = Encoders.STRING
    }, Encoders.STRING)

  private sealed trait Kind
  private case object KInt extends Kind
  private case object KNum extends Kind
  private case object KStr extends Kind
  private case object KBool extends Kind
  private case object KArr extends Kind
  private case object KDate extends Kind
  private case object KTs extends Kind
  private case object KObj extends Kind // map/binary leaves: type only

  private final case class Leaf(path: String, expr: Column, kind: Kind, nullable: Boolean)

  private def scalarKind(dt: DataType): Kind = dt match {
    case ByteType | ShortType | IntegerType | LongType => KInt
    case FloatType | DoubleType | _: DecimalType => KNum
    case StringType => KStr
    case BooleanType => KBool
    case DateType => KDate
    case TimestampType => KTs
    case TimestampNTZType => KTs
    case _ => KObj
  }

  // Leaves of one nesting frame + the array descents that start new frames.
  // Paths are JSON-pointer-ish, with a star segment marking array items
  // (the `kind` field of `spans` items gets the path /spans + /star/kind
  // where "star" is the literal asterisk character).
  private def leavesOf(path: String, e: Column, dt: DataType, nullable: Boolean)
      : (Seq[Leaf], Seq[(String, Column, DataType, Boolean)]) = dt match {
    case st: StructType =>
      val parts = st.fields.toSeq.map(f =>
        leavesOf(s"$path/${f.name}", e.getField(f.name), f.dataType,
          nullable || f.nullable))
      (parts.flatMap(_._1), parts.flatMap(_._2))
    case at: ArrayType =>
      (Seq(Leaf(path, e, KArr, nullable)),
        Seq((s"$path/*", e, at.elementType, at.containsNull)))
    case _ => (Seq(Leaf(path, e, scalarKind(dt), nullable)), Nil)
  }

  /** Evidence table: one row per schema path —
    * (path, json_type, required, min_value, max_value, min_len, max_len,
    * distinct_count, enum_vals, format). */
  def evidence(df: DataFrame): DataFrame =
    frames(df).map { case (frame, leaves) => frameEvidence(frame, leaves) }
      .reduce(_.unionAll(_)).orderBy("path")

  /** (frame, its leaves) for the root and every array descent, recursively.
    * `carry` names a tag column that is NOT evidence (no leaf for it) but
    * must ride through every array-descent frame — the two-snapshot
    * single-pass path groups each branch aggregate by it. */
  private def frames(
      df: DataFrame, carry: Option[String] = None): Seq[(DataFrame, Seq[Leaf])] = {
    def rec(frame: DataFrame, roots: Seq[(String, Column, DataType, Boolean)])
        : Seq[(DataFrame, Seq[Leaf])] = {
      val parts = roots.map { case (p, c, t, n) => leavesOf(p, c, t, n) }
      val own = (frame, parts.flatMap(_._1))
      val kids = parts.flatMap(_._2).flatMap { case (path, expr, elem, elemNullable) =>
        rec(frame.select(carry.map(col).toSeq :+ explode(expr).as("__item"): _*),
          Seq((path, col("__item"), elem, elemNullable)))
      }
      own +: kids
    }
    rec(df, df.schema.fields.toSeq.filterNot(f => carry.contains(f.name)).map(f =>
      (s"/${f.name}", col(f.name), f.dataType, f.nullable)))
  }

  private def frameEvidence(
      df: DataFrame, leaves: Seq[Leaf], group: Option[String] = None): DataFrame = {
    val nullLong = lit(null).cast(LongType)
    val nullDouble = lit(null).cast(DoubleType)
    val nullStr = lit(null).cast(StringType)
    val aggs: Seq[Column] = count(lit(1)).as("__total") +: leaves.zipWithIndex.flatMap {
      case (lf, i) =>
        val e = lf.expr
        val base = Seq(sum(when(e.isNull, 1L).otherwise(0L)).as(s"n$i"))
        val kindAggs = lf.kind match {
          case KInt => Seq(
            min(e.cast(DoubleType)).as(s"mn$i"), max(e.cast(DoubleType)).as(s"mx$i"),
            count_distinct(e).as(s"d$i"))
          case KNum => Seq(
            min(e.cast(DoubleType)).as(s"mn$i"), max(e.cast(DoubleType)).as(s"mx$i"),
            count_distinct(e).as(s"d$i"),
            bool_and(coalesce(e.cast(DoubleType) % lit(1.0d) === lit(0.0d), lit(true)))
              .as(s"w$i"))
          case KStr => Seq(
            min(length(e)).cast(LongType).as(s"lmn$i"),
            max(length(e)).cast(LongType).as(s"lmx$i"),
            count_distinct(e).as(s"d$i"),
            boundedEnumSet(e).as(s"ev$i"),
            bool_and(coalesce(e.rlike(dateRx), lit(true))).as(s"fd$i"))
          case KBool => Seq(count_distinct(e).as(s"d$i"))
          case KArr => Seq(
            min(size(e)).cast(LongType).as(s"lmn$i"),
            max(size(e)).cast(LongType).as(s"lmx$i"))
          case KDate | KTs | KObj => Nil
        }
        base ++ kindAggs
    }
    // NOTE deliberately NOT collapsed into one materialized aggregation:
    // per-branch column pruning specializes each leaf's aggregate to a
    // narrow 1-2 column scan with a single count_distinct — measured
    // FASTER than one fused agg, whose many exact count_distincts force
    // an Expand (input × distinct-groups row multiplication) through one
    // shuffle (lineitem sf0.1: ~0.8 s pruned-branches vs ~4 s fused).
    val one = group match {
      case Some(g) => df.groupBy(col(g)).agg(aggs.head, aggs.tail: _*)
      case None => df.agg(aggs.head, aggs.tail: _*)
    }
    val rows = leaves.zipWithIndex.map { case (lf, i) =>
      val total = col("__total")
      val nulls = col(s"n$i")
      val nonNull = total - nulls
      val jsonType = lf.kind match {
        case KInt => lit("integer")
        case KNum => when(coalesce(col(s"w$i"), lit(true)), "integer").otherwise("number")
        case KStr | KDate | KTs => lit("string")
        case KBool => lit("boolean")
        case KArr => lit("array")
        case KObj => lit("object")
      }
      val hasNum = lf.kind == KInt || lf.kind == KNum
      val hasLen = lf.kind == KStr || lf.kind == KArr
      val hasDistinct = lf.kind == KInt || lf.kind == KNum ||
        lf.kind == KStr || lf.kind == KBool
      val enumVals =
        if (lf.kind == KStr)
          when(col(s"d$i").between(1, enumMax) && nonNull > 0, col(s"ev$i"))
            .otherwise(nullStr)
        else nullStr
      val fmt = lf.kind match {
        case KDate => lit("date")
        case KTs => lit("date-time")
        case KStr => when(nonNull > 0 && col(s"fd$i"), "date").otherwise(nullStr)
        case _ => nullStr
      }
      one.select(
        Seq(
          lit(lf.path).as("path"),
          jsonType.as("json_type"),
          (nulls === 0 && total > 0).as("required"),
          (if (hasNum) col(s"mn$i") else nullDouble).as("min_value"),
          (if (hasNum) col(s"mx$i") else nullDouble).as("max_value"),
          (if (hasLen) col(s"lmn$i") else nullLong).as("min_len"),
          (if (hasLen) col(s"lmx$i") else nullLong).as("max_len"),
          (if (hasDistinct) col(s"d$i") else nullLong).as("distinct_count"),
          enumVals.as("enum_vals"),
          fmt.as("format")) ++
        group.map(g => col(g).as("__side")).toSeq: _*)
    }
    rows.reduce(_.unionAll(_))
  }

  /** Structural drift between two snapshots' evidence tables (the contract
    * counterpart of [[Checks.ksDrift]]'s distribution drift): one row per
    * (path, aspect) where the CURRENT snapshot breaks out of the REFERENCE
    * snapshot's inferred contract —
    *  - `added` / `removed`: path present in only one side
    *  - `type`: JSON type changed (e.g. an integral column saw fractions)
    *  - `required`: nullability changed in either direction
    *  - `min_value` / `max_value`: current range exceeds the reference range
    *  - `min_len` / `max_len`: string/array bounds exceeded likewise
    *  - `enum`: the low-cardinality value set changed (incl. enum lost)
    *  - `format`: a detected format no longer holds
    * Output: (path, aspect, ref_num, cur_num, ref_str, cur_str) — numeric
    * aspects carry doubles, the rest strings; both evidence frames are
    * path-counted tiny, so the join is driver-trivial at any corpus size. */
  def evidenceDiff(refEv: DataFrame, curEv: DataFrame): DataFrame =
    diffRows(refEv, curEv, breaksOnly = false)

  /** Direction-aware variant for continuous monitoring: flags only rows
    * that BREAK OUT of the reference contract, never rows where the
    * current population is a strict subset of it (a micro-batch usually
    * is). Concretely vs [[evidenceDiff]]: `type` accepts integral current
    * values under a `number` contract; `required` fires only when nulls
    * APPEAR under a required contract; `enum` fires only on values outside
    * the reference set (or when the current set outgrew the enum cap). */
  def contractBreaks(refEv: DataFrame, curEv: DataFrame): DataFrame =
    diffRows(refEv, curEv, breaksOnly = true)

  private def diffRows(refEv: DataFrame, curEv: DataFrame,
      breaksOnly: Boolean): DataFrame = {
    // Both evidence tables are one row per schema path — always tiny — so
    // the diff runs entirely on the driver over the collected rows. The
    // distributed formulation (a union of ten aspect-filtered joins) paid
    // one Spark job of overhead PER ASPECT and, without an explicit
    // materialization, re-executed the corpus aggregation behind each
    // branch (measured 10.9 s vs ~0.1 s here for the sf0.1 drift query).
    import org.apache.spark.sql.Row
    val spark = refEv.sparkSession
    def byPath(df: DataFrame): Map[String, Row] =
      df.collect().map(r => r.getString(0) -> r).toMap
    // the two evidence aggregations are independent jobs — submit them
    // CONCURRENTLY so their per-leaf stages interleave in the scheduler.
    // The win is modest at sf0.1 (~2.7 → ~2.4 s median; the branch
    // count_distinct shuffles saturate the 32 local slots, so the jobs
    // mostly serialize on compute) but grows with idle capacity on a real
    // cluster, and it can never be slower than sequential collects.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fRm = Future(byPath(refEv))
    val fCm = Future(byPath(curEv))
    val rm = Await.result(fRm, Duration.Inf)
    val cm = Await.result(fCm, Duration.Inf)
    diffCollected(spark, rm, cm, breaksOnly)
  }

  /** Contract drift between two SAME-SCHEMA snapshots with the evidence for
    * BOTH sides computed in ONE tagged pass: the snapshots union under a
    * side tag and every per-leaf branch aggregate runs `groupBy(side)` —
    * half the stages and half the generated classes of
    * `evidenceDiff(evidence(ref), evidence(cur))`, with identical output —
    * including for an EMPTY side: any (path, side) group with no row
    * (empty snapshot, or an all-null/empty array column whose explode
    * drops every row) is synthesized as the same zero-count evidence a
    * global aggregate emits, so paired ≡ two-pass unconditionally. For
    * micro-batch monitoring against a precomputed reference evidence
    * frame, [[contractBreaks]] remains the right entry point. */
  def evidenceDiffPaired(
      ref: DataFrame, cur: DataFrame, breaksOnly: Boolean = false): DataFrame = {
    // same column NAMES required; types are reconciled by the union's own
    // widening rules (a when()-mutated snapshot column may flip nullability
    // or widen a decimal without changing the contract shape — required-ness
    // and integer-vs-number are measured from the DATA, and lossless
    // widening preserves the data). Irreconcilable types fail in Spark's
    // union analysis with its own error.
    require(ref.columns.toSeq == cur.columns.toSeq,
      "evidenceDiffPaired needs same-column snapshots; use evidenceDiff for heterogeneous frames")
    val side = "__graft_side"
    val cols = ref.columns.map(col).toSeq
    // deliberately NOT cached: each per-leaf branch reads only 1-2 PRUNED
    // columns of the union, and parquet re-scans of narrow columns beat a
    // full-width columnar cache materialization (measured at sf0.1: caching
    // the tagged union grew the drift query from 25 to 36 jobs and from
    // ~25 s to ~40 s of stage task time — the cache build decodes and
    // re-encodes every column once, which the branches never need)
    val tagged = ref.select(lit("r").as(side) +: cols: _*)
      .unionByName(cur.select(lit("c").as(side) +: cols: _*))
    val framesAndLeaves = frames(tagged, carry = Some(side))
    val ev = framesAndLeaves
      .map { case (frame, leaves) => frameEvidence(frame, leaves, Some(side)) }
      .reduce(_.unionAll(_))
    val spark = ref.sparkSession
    val rows = ev.collect() // one row per (path, side) — always tiny
    // a side whose rows never REACH a frame (e.g. an array column that is
    // all-empty/null on that side: explode drops every row before the
    // grouped aggregate) has no group row for the frame's paths. The
    // schemas are identical by construction, so a missing (path, side) can
    // ONLY mean zero rows — synthesize exactly the zero-count evidence the
    // two-pass evidence() produces for an empty frame (a global aggregate
    // always emits one row), keeping paired ≡ two-pass instead of leaking
    // phantom added/removed aspects.
    def zeroRow(lf: Leaf): org.apache.spark.sql.Row = {
      val jsonType = lf.kind match {
        case KInt => "integer"
        case KNum => "integer" // vacuous whole-ness over zero rows
        case KStr | KDate | KTs => "string"
        case KBool => "boolean"
        case KArr => "array"
        case KObj => "object"
      }
      val hasDistinct = lf.kind == KInt || lf.kind == KNum ||
        lf.kind == KStr || lf.kind == KBool
      val fmt = lf.kind match {
        case KDate => "date"
        case KTs => "date-time"
        case _ => null
      }
      org.apache.spark.sql.Row(lf.path, jsonType, false,
        null, null, null, null,
        if (hasDistinct) 0L else null, null, fmt)
    }
    val leavesByPath = framesAndLeaves.flatMap(_._2).map(l => l.path -> l).toMap
    def byPath(tag: String) = {
      val present = rows.filter(_.getString(10) == tag)
        .map(r => r.getString(0) -> r).toMap
      leavesByPath.map { case (p, lf) => p -> present.getOrElse(p, zeroRow(lf)) }
    }
    diffCollected(spark, byPath("r"), byPath("c"), breaksOnly)
  }

  private def diffCollected(
      spark: org.apache.spark.sql.SparkSession,
      rm: Map[String, org.apache.spark.sql.Row],
      cm: Map[String, org.apache.spark.sql.Row],
      breaksOnly: Boolean): DataFrame = {
    import org.apache.spark.sql.Row
    def dOpt(r: Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    def lOpt(r: Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    def sOpt(r: Row, i: Int): Option[String] =
      if (r.isNullAt(i)) None else Some(r.getString(i))
    val out = scala.collection.mutable.ArrayBuffer[Row]()
    def emit(path: String, aspect: String, rn: Option[Double], cn: Option[Double],
        rs: Option[String], cs: Option[String]): Unit =
      out += Row(path, aspect, rn.orNull, cn.orNull, rs.orNull, cs.orNull)
    (rm.keySet ++ cm.keySet).toSeq.sorted.foreach { path =>
      (rm.get(path), cm.get(path)) match {
        case (None, Some(c)) =>
          emit(path, "added", None, None, None, Some(c.getString(1)))
        case (Some(r), None) =>
          emit(path, "removed", None, None, Some(r.getString(1)), None)
        case (Some(r), Some(c)) =>
          val (rt, ct) = (r.getString(1), c.getString(1))
          val typeDrift =
            if (breaksOnly)
              // integer is a subset of number: integral current values
              // under a `number` contract are in-contract
              rt != ct && !(rt == "number" && ct == "integer")
            else rt != ct
          if (typeDrift) emit(path, "type", None, None, Some(rt), Some(ct))
          val (rreq, creq) = (r.getBoolean(2), c.getBoolean(2))
          val reqDrift =
            if (breaksOnly) rreq && !creq else rreq != creq
          if (reqDrift) emit(path, "required", None, None,
            Some(rreq.toString), Some(creq.toString))
          for (rv <- dOpt(r, 3); cv <- dOpt(c, 3); if cv < rv)
            emit(path, "min_value", Some(rv), Some(cv), None, None)
          for (rv <- dOpt(r, 4); cv <- dOpt(c, 4); if cv > rv)
            emit(path, "max_value", Some(rv), Some(cv), None, None)
          for (rv <- lOpt(r, 5); cv <- lOpt(c, 5); if cv < rv)
            emit(path, "min_len", Some(rv.toDouble), Some(cv.toDouble), None, None)
          for (rv <- lOpt(r, 6); cv <- lOpt(c, 6); if cv > rv)
            emit(path, "max_len", Some(rv.toDouble), Some(cv.toDouble), None, None)
          val (re, ce) = (sOpt(r, 8), sOpt(c, 8))
          val curHasValues = lOpt(c, 7).forall(_ > 0)
          val enumDrift =
            if (breaksOnly)
              // outside values appeared, or the set outgrew the enum cap;
              // an all-null batch column (curHasValues false) carries no
              // enum evidence either way — same reasoning as `format`
              // escape-aware split: a value containing '|' must not
              // fragment into phantom enum members (ADVICE r4)
              curHasValues && re.exists { rvs =>
                ce.forall(cvs =>
                  (splitEnumValues(cvs).toSet -- splitEnumValues(rvs).toSet).nonEmpty)
              }
            else re != ce && (re.nonEmpty || ce.nonEmpty)
          if (enumDrift) emit(path, "enum", None, None, re, ce)
          val (rf, cf) = (sOpt(r, 9), sOpt(c, 9))
          // breaks-only: an all-null batch column carries no format
          // evidence either way — don't flag "format lost" on absence
          val formatDrift = rf.nonEmpty && cf != rf &&
            (!breaksOnly || curHasValues)
          if (formatDrift) emit(path, "format", None, None, rf, cf)
      }
    }
    val schema = StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("aspect", StringType, nullable = false),
      StructField("ref_num", DoubleType, nullable = true),
      StructField("cur_num", DoubleType, nullable = true),
      StructField("ref_str", StringType, nullable = true),
      StructField("cur_str", StringType, nullable = true)))
    val sorted = out.sortBy(r => (r.getString(0), r.getString(1)))
    spark.createDataFrame(
      java.util.Arrays.asList(sorted.toSeq: _*), schema)
  }

  /** Infer the draft-7 schema document the corpus satisfies, as JSON. Every
    * row of `df`, serialized with `to_json`, validates against the result
    * (the round-trip property `SchemaInferSpec` asserts). */
  def inferSchema(df: DataFrame): String = {
    val ev = evidence(df).collect()
      .map(r => r.getString(0) -> r).toMap
    // enum values re-collected exactly (the evidence CSV is display/oracle
    // oriented; values containing '|' would corrupt a split)
    val enumPaths = ev.collect {
      case (p, r) if !r.isNullAt(8) => p
    }.toSet
    val enumsByPath: Map[String, Vector[String]] =
      if (enumPaths.isEmpty) Map.empty
      else frames(df).flatMap { case (frame, leaves) =>
        leaves.filter(l => enumPaths.contains(l.path)).map { l =>
          l.path -> frame.select(l.expr.as("v")).where(col("v").isNotNull)
            .distinct().collect().map(_.getString(0)).sorted.toVector
        }
      }.toMap

    def leafNode(path: String, dt: DataType): JVal = {
      val r = ev(path)
      val kind = scalarKind(dt)
      val jsonType = r.getString(1)
      val required = r.getBoolean(2)
      val tpe: JVal =
        if (required) JStr(jsonType) else JArr.of(JStr(jsonType), JStr("null"))
      var fields = Vector[(String, JVal)]("type" -> tpe)
      if ((kind == KInt || kind == KNum) && !r.isNullAt(3)) {
        def num(d: Double): JNum =
          if (jsonType == "integer" && d.isWhole) JNum(d.toLong) else JNum(d)
        fields :+= "minimum" -> num(r.getDouble(3))
        fields :+= "maximum" -> num(r.getDouble(4))
      }
      if (kind == KStr && !r.isNullAt(5)) {
        fields :+= "minLength" -> JNum(r.getLong(5))
        fields :+= "maxLength" -> JNum(r.getLong(6))
      }
      enumsByPath.get(path).foreach { vs =>
        fields :+= "enum" -> JArr(vs.map(JStr(_)))
      }
      if (!r.isNullAt(9)) fields :+= "format" -> JStr(r.getString(9))
      JObj(fields)
    }

    def node(path: String, dt: DataType): JVal = dt match {
      case st: StructType =>
        val req = st.fields.toVector
          .filter(f => ev.get(reqPath(path, f)).exists(_.getBoolean(2)))
          .map(f => JStr(f.name))
        val props = st.fields.toVector.map(f =>
          f.name -> node(s"$path/${f.name}", f.dataType))
        JObj(Vector[(String, JVal)]("type" -> JStr("object")) ++
          (if (req.nonEmpty) Vector("required" -> JArr(req)) else Vector.empty) :+
          ("properties" -> JObj(props)))
      case at: ArrayType =>
        val r = ev(path)
        var fields = Vector[(String, JVal)]("type" ->
          (if (r.getBoolean(2)) JStr("array") else JArr.of(JStr("array"), JStr("null"))))
        if (!r.isNullAt(5)) {
          fields :+= "minItems" -> JNum(r.getLong(5))
          fields :+= "maxItems" -> JNum(r.getLong(6))
        }
        fields :+= "items" -> node(s"$path/*", at.elementType)
        JObj(fields)
      case _ => leafNode(path, dt)
    }

    // the leaf row for a struct FIELD lives at the field's own path for
    // scalars and arrays alike
    def reqPath(parent: String, f: StructField): String = s"$parent/${f.name}"

    val root = JObj(Vector[(String, JVal)](
      "type" -> JStr("object"),
      "required" -> JArr(df.schema.fields.toVector
        .filter(f => ev.get(s"/${f.name}").exists(_.getBoolean(2)))
        .map(f => JStr(f.name))),
      "properties" -> JObj(df.schema.fields.toVector.map(f =>
        f.name -> node(s"/${f.name}", f.dataType)))))
    Json.render(root)
  }
}
