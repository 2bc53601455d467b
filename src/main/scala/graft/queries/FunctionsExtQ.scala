package graft.queries

import graft._
import org.apache.spark.sql.functions._

/** Second wave of scalar function families: string-distance/padding,
  * calendar arithmetic, bitwise ops. All codegen'd built-ins — no UDFs —
  * so they stay inside whole-stage codegen at any scale.
  */
object FunctionsExtQ {

  /** String family 2: levenshtein, lpad/rpad, reverse, instr, translate. */
  val fString2: Q = Q(
    "f_string2",
    (spark, dir) =>
      Tables(spark, dir, "documents")
        .select(
          col("doc_id"),
          levenshtein(substring(col("text"), 1, 8), lit("the quic")).cast("long").as("lev"),
          lpad(col("lang"), 5, "_").as("l5"),
          rpad(col("source"), 8, ".").as("r8"),
          reverse(substring(col("text"), 1, 6)).as("rev6"),
          instr(col("text"), "e").cast("long").as("pos_e"),
          translate(substring(col("text"), 1, 10), "aeiou", "_____").as("tr"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
           | CAST(levenshtein(substr(text,1,8), 'the quic') AS BIGINT) AS lev,
           | lpad(lang, 5, '_') AS l5, rpad(source, 8, '.') AS r8,
           | reverse(substr(text,1,6)) AS rev6,
           | CAST(strpos(text, 'e') AS BIGINT) AS pos_e,
           | translate(substr(text,1,10), 'aeiou', '_____') AS tr
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Calendar family 2: last_day, quarter trunc, ISO week, day diffs. */
  val fDate2: Q = Q(
    "f_date2",
    (spark, dir) =>
      Tables(spark, dir, "orders")
        .select(
          col("o_orderkey"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"),
          date_format(date_trunc("quarter", col("o_orderdate")), "yyyy-MM-dd").as("qtr"),
          weekofyear(col("o_orderdate")).cast("long").as("wk"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
           | strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
           | strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS qtr,
           | CAST(weekofyear(o_orderdate) AS BIGINT) AS wk,
           | CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** Bitwise family: and/or/xor, shifts, popcount — the primitives under
    * hash partitioning, bloom filters and simhash banding. */
  val fBitwise: Q = Q(
    "f_bitwise",
    (spark, dir) =>
      Tables(spark, dir, "events")
        .select(
          col("event_id"),
          col("event_id").bitwiseAND(lit(255L)).as("lo8"),
          col("event_id").bitwiseOR(lit(4096L)).as("set12"),
          col("event_id").bitwiseXOR(lit(21845L)).as("x"),
          shiftleft(col("event_id"), 2).as("shl"),
          shiftright(col("event_id"), 3).as("shr"),
          bit_count(col("event_id")).cast("long").as("nbits"))
        .orderBy("event_id"),
    Some("""SELECT event_id, event_id & 255 AS lo8, event_id | 4096 AS set12,
           | xor(event_id, 21845) AS x, event_id << 2 AS shl, event_id >> 3 AS shr,
           | CAST(bit_count(event_id) AS BIGINT) AS nbits
           |FROM events ORDER BY event_id""".stripMargin))

  /** Conditional/null-handling family: CASE, nullif, ifnull, least /
    * greatest — all fold into codegen'd branches, no UDF. */
  val fCond: Q = Q(
    "f_cond",
    (spark, dir) =>
      Tables(spark, dir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low").as("price_band"),
          nullif(col("o_orderstatus"), lit("P")).as("status_or_null"),
          coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING")).as("status_filled"),
          least(col("o_orderkey") % 1000, lit(500L)).as("lo"),
          greatest(col("o_orderkey") % 1000, lit(500L)).as("hi"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
           | CASE WHEN o_totalprice > 300000 THEN 'high'
           |      WHEN o_totalprice > 100000 THEN 'mid'
           |      ELSE 'low' END AS price_band,
           | nullif(o_orderstatus, 'P') AS status_or_null,
           | COALESCE(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
           | least(o_orderkey % 1000, 500) AS lo,
           | greatest(o_orderkey % 1000, 500) AS hi
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** Error-safe (ANSI try_*) family: try_divide (null on /0), try_cast
    * (null on malformed input), try_element_at (null past the end) — the
    * functions that keep a 100 TB job from dying on the one malformed row
    * in shard 40 000. Spark runs ANSI mode by default in 4.x, so these
    * are THE idiom for lossy inputs; each has bit-identical DuckDB
    * semantics (verified: x/0 → NULL, TRY_CAST, list OOB → NULL). */
  val fTry: Q = Q(
    "f_try",
    (spark, dir) =>
      Tables(spark, dir, "documents")
        .select(
          col("doc_id"),
          try_divide(col("n_chars"), col("doc_id") % 4).as("safe_div"),
          expr("try_cast(CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id AS STRING) ELSE lang END AS BIGINT)")
            .as("safe_cast"),
          try_element_at(split(col("text"), " "), lit(60)).as("tok60"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
           | n_chars / (doc_id % 4) AS safe_div,
           | TRY_CAST(CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id AS VARCHAR) ELSE lang END AS BIGINT) AS safe_cast,
           | string_split(text, ' ')[60] AS tok60
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Data masking: Spark's mask() (upper→X, lower→x, digit→n) — the
    * column-level anonymization companion to t_pii_redact's span-level
    * scrub. DuckDB oracle emulates with an ordered regexp_replace chain
    * (upper first, then lower, then digit — later stages never touch the
    * placeholders earlier stages introduce). */
  val fMask: Q = Q(
    "f_mask",
    (spark, dir) =>
      Tables(spark, dir, "orders")
        .filter(col("o_orderkey") % 23 === 0)
        .select(
          col("o_orderkey"),
          mask(concat_ws("-", col("o_orderpriority"), col("o_orderkey").cast("string")))
            .as("masked"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
           | regexp_replace(regexp_replace(regexp_replace(
           |   o_orderpriority || '-' || CAST(o_orderkey AS VARCHAR),
           |   '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked
           |FROM orders WHERE o_orderkey % 23 = 0 ORDER BY o_orderkey""".stripMargin))

  /** Nested-struct surgery: build a struct column, evolve it with
    * withField (add a derived field), prune with dropFields, then
    * project dotted paths back out. This is the nested-data maintenance
    * surface (append/drop a field inside a deep struct WITHOUT rewriting
    * the siblings) — at 100 TB the win is that parquet stores struct
    * fields as independent column chunks, so the untouched siblings are
    * neither read nor rewritten. Output flattens to scalars (struct
    * stringification differs across engines; the VALUES are the
    * contract). */
  val fStruct: Q = Q(
    "f_struct",
    (spark, dir) => {
      import graft.ops.ColumnOps._
      Tables(spark, dir, "orders")
        .filter(col("o_orderkey") % 100 === 0)
        .withColumn("o", struct(
          col("o_orderkey").as("k"),
          col("o_totalprice").as("price"),
          col("o_orderstatus").as("st")))
        .withColumn("o", col("o")
          .withField("price_cents", cents(col("o.price")))
          .withField("flag", upper(col("o.st")))
          .dropFields("price", "st"))
        .select(
          col("o.k").as("k"),
          col("o.price_cents").as("price_cents"),
          col("o.flag").as("flag"))
        .orderBy("k")
    },
    Some("""SELECT o_orderkey AS k,
           | CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
           | upper(o_orderstatus) AS flag
           |FROM orders WHERE o_orderkey % 100 = 0
           |ORDER BY k""".stripMargin))

  /** Corrupt-tolerant JSON ingestion audit: parse a line feed where a
    * deterministic ~1 % of records carry trailing garbage (the classic
    * truncated/concatenated-log corruption), count good/bad and
    * aggregate only the valid rows — the PERMISSIVE-mode contract a
    * 100 TB log ingest relies on: one malformed record must cost one
    * null row, never a task retry storm. Spark side is `from_json`
    * (Jackson, PERMISSIVE default) where corruption surfaces as a
    * null-fielded struct; the oracle gates on DuckDB's `json_valid`.
    * Row-local parse + one partial-aggregable audit — scan-parallel. */
  val fJsonTolerant: Q = Q(
    "f_json_tolerant",
    (spark, dir) => {
      Tables(spark, dir, "orders")
        .select(col("o_orderkey").as("k"), concat(
          lit("{\"id\": "), col("o_orderkey"),
          lit(", \"cents\": "), graft.ops.ColumnOps.cents(col("o_totalprice")),
          lit("}")).as("line0"))
        // corruption = truncation (the log-rotation tear): drop the last
        // 3 chars of ~1% of records — rejected by BOTH Jackson and
        // json_valid, unlike trailing garbage, which Jackson tolerates
        .select(when(col("k") % 97 === 0,
          expr("substring(line0, 1, length(line0) - 3)")).otherwise(col("line0"))
          .as("line"))
        .select(from_json(col("line"),
          org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, cents BIGINT")).as("j"))
        .agg(
          count(when(col("j.id").isNull, 1)).as("n_corrupt"),
          count(when(col("j.id").isNotNull, 1)).as("n_valid"),
          sum(col("j.cents")).as("valid_cents"))
    },
    Some("""WITH raw0 AS (
           |  SELECT o_orderkey AS k,
           |         '{"id": ' || o_orderkey || ', "cents": '
           |         || CAST(round(o_totalprice*100) AS BIGINT) || '}' AS line0
           |  FROM orders),
           |raw AS (
           |  SELECT CASE WHEN k % 97 = 0
           |              THEN substring(line0, 1, length(line0) - 3)
           |              ELSE line0 END AS line
           |  FROM raw0)
           |SELECT COUNT(CASE WHEN NOT json_valid(line) THEN 1 END) AS n_corrupt,
           |       COUNT(CASE WHEN json_valid(line) THEN 1 END) AS n_valid,
           |       CAST(SUM(CASE WHEN json_valid(line)
           |             THEN CAST(json_extract(line, '$.cents') AS BIGINT) END)
           |            AS BIGINT) AS valid_cents
           |FROM raw""".stripMargin))

  val all: Seq[Q] = Seq(fString2, fDate2, fBitwise, fCond, fTry, fMask, fStruct,
    fJsonTolerant)
}
