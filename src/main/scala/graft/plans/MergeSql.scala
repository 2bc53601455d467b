package graft.plans

/** `MERGE INTO` statement generation for transactional table formats.
  *
  * This build targets plain parquet (the offline classpath carries no
  * Delta/Iceberg jars), so the engine's upserts are implemented by
  * rewrite: `sink_upsert` (full-outer join + coalesce, SinkQ.scala),
  * `x_merge_apply` (CDC apply with deletes, AnalyticsExtQ.scala) and
  * `StreamingOps.applyUpsert` (versioned snapshot rewrite). On a cluster
  * WITH a transactional format the same logical step is one atomic
  * `MERGE INTO` — no snapshot rewrite, no versioned-dir protocol. This
  * object emits that statement from a declarative spec so a user can
  * lift the port verbatim; the generated text is Spark-parser-verified
  * in MergeSqlSpec (Catalyst parses MERGE INTO natively — only
  * EXECUTION needs a v2 table provider, so syntax is testable offline).
  *
  * Scale note: on Delta/Iceberg the MERGE compiles to the same shuffle
  * shape as the rewrite twins — a key-partitioned join between target
  * and source — but touches only the files whose keys match, which is
  * the whole point of porting once a format is available.
  */
object MergeSql {

  /** One MERGE statement: `UPDATE SET` every non-key column, optional
    * matched-DELETE guard, and INSERT of all columns on no-match —
    * the upsert-with-deletes shape every CDC apply uses.
    *
    * @param target      target table identifier (may be qualified)
    * @param source      source relation: table name or a parenthesizable
    *                    subquery via [[usingSubquery]]
    * @param keyCols     equi-join key columns (non-empty)
    * @param payloadCols non-key columns to SET on match / INSERT on miss
    * @param deleteWhen  extra predicate over `s.`/`t.` columns: a matched
    *                    row satisfying it is DELETED instead of updated
    * @param updateWhen  extra predicate guarding the UPDATE clause (e.g.
    *                    latest-wins: only update when the source row is
    *                    newer); None = update every remaining match
    */
  final case class MergeSpec(
      target: String,
      source: String,
      keyCols: Seq[String],
      payloadCols: Seq[String],
      deleteWhen: Option[String] = None,
      updateWhen: Option[String] = None,
      usingSubquery: Boolean = false) {
    require(keyCols.nonEmpty, "MERGE needs at least one key column")
    require((keyCols ++ payloadCols).distinct.size == keyCols.size + payloadCols.size,
      "key and payload column sets must be disjoint and duplicate-free")
  }

  /** Render `spec` as an ANSI / Delta / Iceberg `MERGE INTO` statement. */
  def mergeInto(spec: MergeSpec): String = {
    val src = if (spec.usingSubquery) s"(${spec.source})" else spec.source
    val on = spec.keyCols.map(k => s"t.$k = s.$k").mkString(" AND ")
    val setClause = spec.payloadCols.map(c => s"t.$c = s.$c").mkString(", ")
    val allCols = spec.keyCols ++ spec.payloadCols
    val insertCols = allCols.mkString(", ")
    val insertVals = allCols.map(c => s"s.$c").mkString(", ")
    val deleteClause = spec.deleteWhen
      .map(p => s"WHEN MATCHED AND ($p) THEN DELETE\n")
      .getOrElse("")
    val updateGuard = spec.updateWhen.map(p => s" AND ($p)").getOrElse("")
    val updateClause =
      if (spec.payloadCols.isEmpty) ""
      else s"WHEN MATCHED$updateGuard THEN UPDATE SET $setClause\n"
    s"""MERGE INTO ${spec.target} t
       |USING $src s
       |ON $on
       |$deleteClause${updateClause}WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin
  }

  /** The `sink_upsert` rewrite (SinkQ.scala) as a MERGE: updates win on
    * key collision, fresh keys insert. */
  val sinkUpsertPort: String = mergeInto(MergeSpec(
    target = "orders_snapshot",
    source = """SELECT o_orderkey AS k, CAST(round(o_totalprice*100) AS BIGINT)*2 AS price_cents, 'U' AS status
                |      FROM orders_updates WHERE o_orderkey % 7 = 0
                |      UNION ALL
                |      SELECT o_orderkey + 10000000000 AS k, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents, 'I' AS status
                |      FROM orders_updates WHERE o_orderkey % 97 = 0""".stripMargin,
    keyCols = Seq("k"),
    payloadCols = Seq("price_cents", "status"),
    usingSubquery = true))

  /** The `x_merge_apply` CDC apply (AnalyticsExtQ.scala) as a MERGE:
    * latest change per user upserts, an 'error' change deletes the key.
    * The latest-per-key reduction stays in the USING subquery — exactly
    * where the rewrite twin computes it. */
  val mergeApplyPort: String = mergeInto(MergeSpec(
    target = "user_profiles",
    source = """SELECT user_id, event_type AS state_type,
                |        CAST(round(value*100) AS BIGINT) AS value_cents, event_id AS last_event_id
                |      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                |              ORDER BY ts DESC, event_id DESC) AS rn
                |            FROM events_delta) WHERE rn = 1""".stripMargin,
    keyCols = Seq("user_id"),
    payloadCols = Seq("state_type", "value_cents", "last_event_id"),
    deleteWhen = Some("s.state_type = 'error'"),
    usingSubquery = true))

  /** `StreamingOps.applyUpsert`'s per-micro-batch step as a MERGE (run
    * inside foreachBatch against a transactional target; the versioned
    * snapshot protocol disappears because the format's commit is atomic
    * and a replayed batch re-merges idempotently — the latest-wins
    * UPDATE guard on the (ts, event_id) total order makes a replay a
    * no-op instead of a double-apply). */
  val streamingUpsertPort: String = mergeInto(MergeSpec(
    target = "user_latest",
    source = """SELECT user_id, s.ts AS ts, s.event_id AS event_id, s.value AS value
                |      FROM (SELECT user_id, MAX(STRUCT(ts, event_id, value)) AS s
                |            FROM batch_view GROUP BY user_id)""".stripMargin,
    keyCols = Seq("user_id"),
    payloadCols = Seq("ts", "event_id", "value"),
    updateWhen = Some("s.ts > t.ts OR (s.ts = t.ts AND s.event_id > t.event_id)"),
    usingSubquery = true))
}
