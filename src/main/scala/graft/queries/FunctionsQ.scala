package graft.queries

import graft._
import graft.ops.ColumnOps._
import org.apache.spark.sql.functions._

/** Scalar function families (SURVEY.md §2.2): string, date/time, math,
  * array lambda functions, JSON extraction. All codegen'd built-ins — no
  * UDFs on these paths.
  *
  * Cross-engine determinism notes: transcendentals (log/exp) are NOT
  * bit-identical across libm implementations, so oracle outputs stick to
  * exact ops (abs/floor/ceil/round/%) plus sqrt, which IEEE-754 requires
  * to be correctly rounded.
  */
object FunctionsQ {

  val fString: Q = Q(
    "f_string",
    (spark, dir) =>
      Tables(spark, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 4).as("pre4"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        when(col("p_name").like("%wid%"), 1L).otherwise(0L).as("has_wid"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        size(split(col("p_name"), " ")).cast("long").as("n_words"),
        lpad(col("p_brand"), 12, ".").as("brand_pad"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, upper(p_name) AS uname, substring(p_name, 1, 4) AS pre4,
           | CAST(length(p_name) AS BIGINT) AS name_len,
           | concat_ws('-', p_brand, p_type) AS brand_type,
           | CASE WHEN p_name LIKE '%wid%' THEN 1 ELSE 0 END AS has_wid,
           | COALESCE(regexp_extract(p_name, '([a-z]+)$', 1), '') AS last_word,
           | CAST(length(string_split(p_name, ' ')) AS BIGINT) AS n_words,
           | lpad(p_brand, 12, '.') AS brand_pad,
           | trim('  ' || p_name || '  ') AS trimmed
           |FROM part ORDER BY p_partkey""".stripMargin))

  val fDate: Q = Q(
    "f_date",
    (spark, dir) => {
      val ts = col("o_orderdate").cast("timestamp")
      Tables(spark, dir, "orders").select(
        col("o_orderkey"),
        date_format(ts, "yyyy-MM-dd").as("d"),
        year(ts).cast("long").as("y"),
        month(ts).cast("long").as("m"),
        dayofmonth(ts).cast("long").as("dom"),
        quarter(ts).cast("long").as("qtr"),
        (weekday(ts) + 1).cast("long").as("isodow"),
        date_format(date_trunc("month", ts), "yyyy-MM-dd").as("month_start"),
        datediff(ts.cast("date"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
        unix_timestamp(ts).as("epoch_s"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS d,
           | CAST(year(o_orderdate) AS BIGINT) AS y,
           | CAST(month(o_orderdate) AS BIGINT) AS m,
           | CAST(day(o_orderdate) AS BIGINT) AS dom,
           | CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           | CAST(isodow(o_orderdate) AS BIGINT) AS isodow,
           | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           | CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
           | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  val fMath: Q = Q(
    "f_math",
    (spark, dir) => {
      val qty = col("l_quantity").cast("long")
      Tables(spark, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        qty.as("qty"),
        abs(cents(col("l_extendedprice")) - 5000000L).as("abs_diff_cents"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        round(col("l_extendedprice") * 10).cast("long").as("price_dec1"),
        sqrt(qty.cast("double")).as("sqrt_qty"),
        (qty * qty).as("qty_sq"),
        (col("l_orderkey") % 7).as("mod7"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty,
           | abs(CAST(round(l_extendedprice*100) AS BIGINT) - 5000000) AS abs_diff_cents,
           | CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           | CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           | CAST(round(l_extendedprice*10) AS BIGINT) AS price_dec1,
           | sqrt(CAST(CAST(l_quantity AS BIGINT) AS DOUBLE)) AS sqrt_qty,
           | CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS qty_sq,
           | l_orderkey % 7 AS mod7
           |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin))

  val fArray: Q = Q(
    "f_array",
    (spark, dir) =>
      Tables(spark, dir, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        fixed(element_at(col("embedding"), 1), 1000000).as("e1_micro"),
        aggregate(
          transform(slice(col("embedding"), 1, 8), x => fixed(x, 1000)),
          lit(0L), (acc, x) => acc + x).as("q8_sum"),
        size(filter(col("embedding"), x => x > 0f)).cast("long").as("n_pos"))
        .orderBy("vec_id"),
    Some("""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
           | CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT) AS e1_micro,
           | CAST(list_sum(list_transform(embedding[1:8], x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS q8_sum,
           | CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
           |FROM embeddings ORDER BY vec_id""".stripMargin))

  val fExplode: Q = Q(
    "f_explode",
    (spark, dir) =>
      Tables(spark, dir, "embeddings")
        .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 4)))
        .select(
          col("vec_id"),
          (col("pos") + 1).cast("long").as("pos"),
          fixed(col("col"), 1000).as("val_milli"))
        .orderBy("vec_id", "pos"),
    Some("""SELECT vec_id, CAST(pos AS BIGINT) AS pos,
           | CAST(round(CAST(v AS DOUBLE) * 1000) AS BIGINT) AS val_milli
           |FROM (SELECT vec_id, unnest(embedding[1:4]) AS v,
           |             generate_subscripts(embedding[1:4], 1) AS pos
           |      FROM embeddings) t
           |ORDER BY vec_id, pos""".stripMargin))

  val fJson: Q = Q(
    "f_json",
    (spark, dir) =>
      Tables(spark, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        (get_json_object(col("props"), "$.k").isNotNull.cast("long")).as("has_k"),
        get_json_object(col("props"), "$.missing").as("missing_attr"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
           | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           | CASE WHEN json_extract_string(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END AS has_k,
           | json_extract_string(props, '$.missing') AS missing_attr
           |FROM events ORDER BY event_id""".stripMargin))

  /** Structured JSON parse + map functions: from_json into a typed map,
    * then map_keys/map_values/element access. */
  val fMap: Q = Q(
    "f_map",
    (spark, dir) => {
      val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType))
      Tables(spark, dir, "events").select(
        col("event_id"),
        size(map_keys(m)).cast("long").as("n_keys"),
        array_join(array_sort(map_keys(m)), ",").as("keys_sorted"),
        element_at(m, "k").as("k_val"),
        coalesce(element_at(m, "absent"), lit(-1L)).as("absent_val"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
           | CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
           | array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
           | CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           | COALESCE(CAST(json_extract(props, '$.absent') AS BIGINT), -1) AS absent_val
           |FROM events ORDER BY event_id""".stripMargin))

  /** explode_outer: generator rows for EMPTY arrays survive as null rows
    * (plain explode silently drops them — losing the parent row is the
    * classic flatten bug in ingest pipelines). Every 7th doc's token
    * array is emptied to exercise both paths; DuckDB emulates outer
    * semantics by substituting [NULL] for the empty list. */
  val fExplodeOuter: Q = Q(
    "f_explode_outer",
    (spark, dir) =>
      Tables(spark, dir, "documents")
        .filter(col("doc_id") < 60)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, array().cast("array<string>"))
            .otherwise(slice(split(col("text"), " "), 1, 3)).as("toks"))
        .select(col("doc_id"), explode_outer(col("toks")).as("tok"))
        .orderBy(col("doc_id"), col("tok").asc_nulls_first),
    Some("""WITH t AS (SELECT doc_id,
           |    CASE WHEN doc_id % 7 = 0 THEN CAST([] AS VARCHAR[])
           |         ELSE string_split(text, ' ')[1:3] END AS toks
           |  FROM documents WHERE doc_id < 60)
           |SELECT doc_id,
           |  unnest(CASE WHEN len(toks) = 0 THEN CAST([NULL] AS VARCHAR[])
           |              ELSE toks END) AS tok
           |FROM t ORDER BY doc_id, tok NULLS FIRST""".stripMargin))

  /** Map higher-order functions: transform_values / map_filter /
    * map_zip_with / map_concat over a map synthesized deterministically
    * from the event's k value (map_from_arrays). Outputs reduce to
    * scalars (map stringification is not cross-engine stable); the DuckDB
    * oracle computes the closed forms of the same map algebra. All
    * codegen-fallback-free column expressions — no UDF. */
  val fMap2: Q = Q(
    "f_map2",
    (spark, dir) => {
      val k = get_json_object(col("props"), "$.k").cast("long")
      val m = map_from_arrays(
        array(lit("a"), lit("b"), lit("c")),
        array(k, k * 2, pmod(k, lit(7L))))
      val tv = transform_values(m, (_, v) => v + 1)
      val mf = map_filter(m, (_, v) => pmod(v, lit(2L)) === 0)
      val mz = map_zip_with(m, tv, (_, v1, v2) => v1 + v2)
      Tables(spark, dir, "events").select(
        col("event_id"),
        aggregate(map_values(tv), lit(0L), (acc, v) => acc + v).as("sum_tv"),
        size(map_keys(mf)).cast("long").as("n_even"),
        aggregate(map_values(mz), lit(0L), (acc, v) => acc + v).as("sum_zip"),
        size(map_keys(map_concat(m, map(lit("d"), lit(1L))))).cast("long").as("n_concat"))
        .orderBy("event_id")
    },
    Some("""WITH e AS (SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
           |SELECT event_id,
           |  (k + 1) + (k * 2 + 1) + (k % 7 + 1) AS sum_tv,
           |  CAST((CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END)
           |     + (CASE WHEN (k * 2) % 2 = 0 THEN 1 ELSE 0 END)
           |     + (CASE WHEN (k % 7) % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
           |  (2 * k + 1) + (2 * (k * 2) + 1) + (2 * (k % 7) + 1) AS sum_zip,
           |  CAST(4 AS BIGINT) AS n_concat
           |FROM e ORDER BY event_id""".stripMargin))

  val all: Seq[Q] = Seq(fString, fDate, fMath, fArray, fExplode, fJson, fMap, fExplodeOuter, fMap2)
}
