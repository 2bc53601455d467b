package graft.queries

import graft._
import org.apache.spark.sql.functions._

/** Training-data preparation operators (round 4): PII redaction,
  * Gopher-style document quality signals, and distribution-position
  * windows — the scrub/filter/analyze steps a 100 TB corpus pipeline runs
  * between ingest and tokenization. All pure column expressions over the
  * scan (no shuffle except the final orderBy for oracle determinism).
  */
object TrainPrepQ {

  /** PII redaction: regex-scrub emails, dotted-quad IPs and US-style phone
    * numbers, emitting the redacted text plus per-kind match counts (the
    * audit trail a compliance pass needs). The synthetic corpus carries no
    * PII, so the query first plants deterministic doc_id-derived spans —
    * identically on both engines — and then proves the scrub removes
    * exactly what was planted. One narrow projection: at 100 TB this is a
    * map-only pass whose cost is regex throughput, no shuffle.
    */
  val tPiiRedact: Q = Q(
    "t_pii_redact",
    (spark, dir) => {
      val emailRe = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
      val planted = concat(
        col("text"), lit(" contact user"), col("doc_id"), lit("@example.com at "),
        lit("10.0."), col("doc_id") % 256, lit(".7 or 555-"), format_string("%03d", col("doc_id") % 1000), lit("-4242"))
      Tables(spark, dir, "documents")
        .select(col("doc_id"), planted.as("txt"))
        .select(
          col("doc_id"),
          size(regexp_extract_all(col("txt"), lit(emailRe), lit(0))).cast("long").as("n_email"),
          size(regexp_extract_all(col("txt"), lit(ipRe), lit(0))).cast("long").as("n_ip"),
          size(regexp_extract_all(col("txt"), lit(phoneRe), lit(0))).cast("long").as("n_phone"),
          regexp_replace(regexp_replace(regexp_replace(col("txt"),
            emailRe, "<EMAIL>"), ipRe, "<IP>"), phoneRe, "<PHONE>").as("redacted"))
        .withColumn("clean", (col("n_email") + col("n_ip") + col("n_phone") === 0).cast("long"))
        .orderBy("doc_id")
    },
    Some("""WITH p AS (SELECT doc_id,
           |    text || ' contact user' || doc_id || '@example.com at 10.0.' ||
           |    (doc_id % 256) || '.7 or 555-' || printf('%03d', doc_id % 1000) || '-4242' AS txt
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(txt, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_email,
           |  CAST(len(regexp_extract_all(txt, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
           |  CAST(len(regexp_extract_all(txt, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phone,
           |  regexp_replace(regexp_replace(regexp_replace(txt,
           |    '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
           |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
           |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted,
           |  CAST(CASE WHEN len(regexp_extract_all(txt, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}'))
           |        + len(regexp_extract_all(txt, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
           |        + len(regexp_extract_all(txt, '\b\d{3}-\d{3}-\d{4}\b')) = 0
           |       THEN 1 ELSE 0 END AS BIGINT) AS clean
           |FROM p ORDER BY doc_id""".stripMargin))

  /** Gopher-style quality signals (Rae et al. 2021, arXiv:2112.11446 §A1):
    * mean word length, symbol-to-word ratio, fraction of duplicate tokens
    * (type/token deficit), and an accept flag combining banded rules. All
    * exact-integer inputs with single final divisions, so doubles are
    * bit-identical across engines. Map-only at scale, like t_quality.
    */
  val tGopherQuality: Q = Q(
    "t_gopher_quality",
    (spark, dir) => {
      val toks = split(col("text"), " ")
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text"), toks.as("toks"))
        .select(
          col("doc_id"),
          size(col("toks")).cast("long").as("n_words"),
          size(array_distinct(col("toks"))).cast("long").as("n_types"),
          (length(col("text")) - size(col("toks")) + 1).cast("long").as("n_word_chars"),
          size(regexp_extract_all(col("text"), lit("[^a-z0-9 ]"), lit(0))).cast("long").as("n_symbols"))
        .select(
          col("doc_id"), col("n_words"), col("n_types"),
          (col("n_word_chars").cast("double") / col("n_words")).as("mean_word_len"),
          (col("n_symbols").cast("double") / col("n_words")).as("symbol_ratio"),
          (lit(1.0) - col("n_types").cast("double") / col("n_words")).as("dup_frac"))
        .withColumn("accept",
          (col("n_words").between(50, 100000) &&
            col("mean_word_len").between(1.0, 10.0) &&
            col("symbol_ratio") < 0.1 &&
            col("dup_frac") < 0.7).cast("long"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
           |m AS (SELECT doc_id,
           |    CAST(len(toks) AS BIGINT) AS n_words,
           |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
           |    CAST(length(text) - len(toks) + 1 AS BIGINT) AS n_word_chars,
           |    CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS BIGINT) AS n_symbols
           |  FROM t)
           |SELECT doc_id, n_words, n_types,
           |  CAST(n_word_chars AS DOUBLE) / n_words AS mean_word_len,
           |  CAST(n_symbols AS DOUBLE) / n_words AS symbol_ratio,
           |  1.0 - CAST(n_types AS DOUBLE) / n_words AS dup_frac,
           |  CAST(CASE WHEN n_words BETWEEN 50 AND 100000
           |        AND (CAST(n_word_chars AS DOUBLE) / n_words) BETWEEN 1.0 AND 10.0
           |        AND (CAST(n_symbols AS DOUBLE) / n_words) < 0.1
           |        AND (1.0 - CAST(n_types AS DOUBLE) / n_words) < 0.7
           |       THEN 1 ELSE 0 END AS BIGINT) AS accept
           |FROM m ORDER BY doc_id""".stripMargin))

  /** cume_dist + percent_rank distribution positions: where each order sits
    * inside its priority class's price distribution. Both are rank-count
    * ratios of exact integers — bit-identical doubles. The quantile-
    * position shape used to threshold corpora ("keep the top X% by
    * quality score") without materializing a global sort.
    *
    * The ordering key (price_cents, o_orderkey) is UNIQUE within a
    * priority class, so there are no window peers and both positions
    * reduce to the running row count: cd = rn/n, pr = (rn-1)/(n-1) —
    * the same exact-integer divisions `cume_dist()`/`percent_rank()`
    * compute. That lets the rank come from a
    * [[graft.ops.DistributedPrefix]] price-range-blocked running count
    * instead of `Window.partitionBy(priority)`: priority cardinality is
    * a schema property (5 values), so the plain window would sort each
    * class's sf-proportional rows in one task; blocked, the grain is
    * (priority, price-range) and the group sizes are a 5-row broadcast.
    */
  val wCumeDist: Q = Q(
    "w_cume_dist",
    (spark, dir) => {
      // NOT checkpointed: a pruned scan + filter re-reads cheaper than a
      // checkpoint materializes (see w_percent_rank) — rescan per
      // reference, sizes checkpointed below so bounds reuse its one pass
      val base = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          graft.ops.ColumnOps.cents(col("o_totalprice")).as("price_cents"))
        .filter(col("o_orderkey") % 19 === 0)
      // one pass: per-priority counts carry the price extrema, the global
      // bounds reduce the 5-row frame (no second scan of base)
      val sizes = base.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("__n"),
          min(col("price_cents")).as("__mn"), max(col("price_cents")).as("__mx"))
        .localCheckpoint()
      val bounds = sizes.agg(min(col("__mn")).as("blo"), max(col("__mx")).as("bhi"))
      graft.ops.DistributedPrefix.runningSum(
          base.crossJoin(broadcast(bounds)),
          block = graft.ops.DistributedPrefix.rangeBucket(
            col("price_cents"), col("blo"), col("bhi"), 64),
          blockAsc = true,
          localOrder = Seq(col("price_cents"), col("o_orderkey")),
          value = lit(1L),
          out = "rn",
          groupCols = Seq("o_orderpriority"))
        .join(broadcast(sizes), Seq("o_orderpriority"))
        .withColumn("cd", col("rn").cast("double") / col("__n").cast("double"))
        .withColumn("pr", when(col("__n") === 1L, lit(0.0))
          .otherwise((col("rn") - 1L).cast("double") / (col("__n") - 1L).cast("double")))
        .select(col("o_orderkey"), col("o_orderpriority"), col("price_cents"),
          col("cd"), col("pr"))
        .orderBy("o_orderpriority", "price_cents", "o_orderkey")
    },
    Some("""WITH o AS (SELECT o_orderkey, o_orderpriority,
           |    CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
           |  FROM orders WHERE o_orderkey % 19 = 0)
           |SELECT o_orderkey, o_orderpriority, price_cents,
           |  cume_dist() OVER (PARTITION BY o_orderpriority
           |                    ORDER BY price_cents, o_orderkey) AS cd,
           |  percent_rank() OVER (PARTITION BY o_orderpriority
           |                       ORDER BY price_cents, o_orderkey) AS pr
           |FROM o ORDER BY o_orderpriority, price_cents, o_orderkey""".stripMargin))

  /** Benchmark decontamination: flag corpus documents sharing any 5-gram
    * (token shingle) with a FIXED-SIZE eval set (doc_id < 50 stands in for
    * a benchmark suite — its size does not grow with the corpus). The
    * GPT-3-style n-gram overlap check. Plan shape at 100 TB: the eval
    * shingle set is small and FIXED, so it broadcasts (scale-correct — not
    * sf-proportional) and the corpus side stays a map-side hash probe +
    * one partial-aggregable count shuffle; per-doc shingles are deduped
    * BEFORE the explode so the join input is linear in corpus size.
    */
  val dDecontam: Q = Q(
    "d_decontam",
    (spark, dir) => {
      val toks = split(col("text"), " ")
      val sh5 = transform(sequence(lit(1), size(col("toks")) - 4),
        i => concat_ws(" ", slice(col("toks"), i, lit(5))))
      val shingled = Tables(spark, dir, "documents")
        .select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) >= 5)
        .select(col("doc_id"), explode(array_distinct(sh5)).as("sh"))
      val evalSet = shingled.filter(col("doc_id") < 50).select("sh").distinct()
      shingled.filter(col("doc_id") >= 50)
        .join(broadcast(evalSet), "sh")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
           |           WHERE len(string_split(text, ' ')) >= 5),
           |s AS (SELECT doc_id, unnest(list_distinct(list_transform(
           |        range(1, len(l) - 3), i -> array_to_string(l[i:i+4], ' ')))) AS sh
           |      FROM t),
           |e AS (SELECT DISTINCT sh FROM s WHERE doc_id < 50)
           |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
           |FROM s JOIN e USING (sh) WHERE s.doc_id >= 50
           |GROUP BY s.doc_id ORDER BY doc_id""".stripMargin))

  /** Weighted dataset mixing: per-source keep rates (the corpus-mixture
    * construction step — upsample curated sources, downsample crawl)
    * applied by a deterministic multiplicative-hash gate (reproducible
    * across runs/engines/partitionings, the [[SampleQ]] discipline).
    * Assignment is row-local (no shuffle); the audit summary is one
    * partial+final agg.
    */
  val sMixWeighted: Q = Q(
    "s_mix_weighted",
    (spark, dir) => {
      val bucket = (col("doc_id") % 1000003L) * 2654435761L % 1000L
      val rate = when(col("source").isin("src0", "src1"), 900L)
        .when(col("source").isin("src2", "src3", "src4"), 500L)
        .otherwise(150L)
      Tables(spark, dir, "documents")
        .withColumn("kept", (bucket < rate).cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"), sum(col("kept")).as("n_kept"))
        .withColumn("kept_frac",
          col("n_kept").cast("double") / col("n_total").cast("double"))
        .orderBy("source")
    },
    Some("""WITH d AS (SELECT source,
           |    CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000 <
           |      CASE WHEN source IN ('src0','src1') THEN 900
           |           WHEN source IN ('src2','src3','src4') THEN 500
           |           ELSE 150 END
           |    THEN 1 ELSE 0 END AS kept
           |  FROM documents)
           |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total,
           |  CAST(SUM(kept) AS BIGINT) AS n_kept,
           |  CAST(SUM(kept) AS DOUBLE) / COUNT(*) AS kept_frac
           |FROM d GROUP BY source ORDER BY source""".stripMargin))

  /** Sequence packing: assign documents to fixed-token-budget training
    * packs (1024 tokens) per source shard — pack_id = floor(running token
    * cumsum / budget), the deterministic first-fit-in-order approximation
    * (a doc spanning a boundary starts the next pack; no splitting).
    * The per-source running sum goes through
    * [[graft.ops.DistributedPrefix]] doc_id-range blocks (same
    * discipline as `mm_shard_pack`): source cardinality is a corpus
    * property, so a source-keyed window would cap the cumsum at
    * n_sources tasks while each source's doc count grows with the data.
    * Blocked, the window grain is (source, doc_id-range) and the pack
    * assignment scales horizontally with no global state. Output:
    * per-pack doc count and token fill (packs overfill by at most one
    * document, the no-split tradeoff).
    */
  val tSeqPack: Q = Q(
    "t_seq_pack",
    (spark, dir) => {
      val sized = Tables(spark, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .localCheckpoint() // feeds bounds + both prefix references
      val bounds = sized.agg(
        min(col("doc_id")).as("blo"), max(col("doc_id")).as("bhi"))
      graft.ops.DistributedPrefix.runningSum(
          sized.crossJoin(broadcast(bounds)),
          block = graft.ops.DistributedPrefix.rangeBucket(
            col("doc_id"), col("blo"), col("bhi"), 64),
          blockAsc = true,
          localOrder = Seq(col("doc_id")),
          value = col("n_tok"),
          out = "cum",
          groupCols = Seq("source"))
        .withColumn("tok_before", col("cum") - col("n_tok"))
        .withColumn("pack_id", (col("tok_before") / 1024L).cast("long"))
        .groupBy(col("source"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy("source", "pack_id")
    },
    Some("""WITH d AS (SELECT source, doc_id,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           |  FROM documents),
           |c AS (SELECT source, doc_id, n_tok,
           |    COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
           |  FROM d)
           |SELECT source, CAST(tok_before // 1024 AS BIGINT) AS pack_id,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
           |FROM c GROUP BY source, tok_before // 1024
           |ORDER BY source, pack_id""".stripMargin))

  /** Gopher-style REPETITION signals (Rae et al. 2021 §A1.1, the half of
    * the filter the quality query doesn't cover): duplicate-word mass and
    * most-frequent-bigram concentration. Emitted as exact integer
    * numerators/denominators (n_words, n_distinct, n_bigrams,
    * top_bigram_n) — the filter thresholds (e.g. "drop if top bigram >
    * 20% of bigrams") divide on the consumer side, keeping cross-engine
    * parity bit-exact. All columns derive from per-doc array ops + one
    * per-(doc,bigram) count: narrow except a single doc_id-partitioned
    * aggregation, linear at any corpus size. */
  val tRepetition: Q = Q(
    "t_repetition",
    (spark, dir) => {
      val base = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          filter(split(col("text"), " "), t => t =!= "").as("toks"))
      val stats = base.select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        zip_with(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
          slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b)).as("bigrams"))
      val top = stats
        .select(col("doc_id"), explode(col("bigrams")).as("bigram"))
        .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("top_bigram_n"))
      stats.join(top, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_words"), col("n_distinct"),
          size(col("bigrams")).cast("long").as("n_bigrams"),
          coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"))
        .orderBy("doc_id")
    },
    Some("""WITH tl AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS toks FROM documents),
           |tok AS (SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos FROM tl),
           |b AS (
           |  SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
           |  FROM tok),
           |bc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM b WHERE bigram IS NOT NULL GROUP BY 1, 2),
           |top AS (SELECT doc_id, MAX(c) AS top_bigram_n FROM bc GROUP BY 1)
           |SELECT tl.doc_id AS doc_id, CAST(len(toks) AS BIGINT) AS n_words,
           |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           |  CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n_bigrams,
           |  CAST(COALESCE(top.top_bigram_n, 0) AS BIGINT) AS top_bigram_n
           |FROM tl LEFT JOIN top ON tl.doc_id = top.doc_id
           |ORDER BY tl.doc_id""".stripMargin))

  /** Data-derived domain mixing (the step s_mix_weighted's STATIC rates
    * skip): compute each source domain's token mass, give every domain an
    * equal share of the total token budget, and plan
    * `least(domain_tokens, budget)` kept tokens per domain — the
    * Pile-style "cap the over-represented domains, keep the small ones
    * whole" mixture. keep_bp is the planned keep rate in integer basis
    * points (exact floor division, no float), the number a downstream
    * hash-sampler would consume.
    *
    * Scale: per-doc token counts come straight off the scan (size of the
    * split — no explode), the domain rollup is one hash aggregate to
    * #domains rows (localCheckpoint'd: it feeds the totals AND the final
    * projection), and the corpus total is one broadcast row. */
  val sDomainBudget: Q = Q(
    "s_domain_budget",
    (spark, dir) => {
      val s = Tables(spark, dir, "documents")
        .select(col("source"),
          expr("cast(size(filter(split(text, ' '), x -> length(x) > 0)) as bigint)").as("ntok"))
        .groupBy(col("source")).agg(sum(col("ntok")).as("domain_tokens"))
        .localCheckpoint()
      val tot = s.agg(sum(col("domain_tokens")).as("total_tokens"),
        count(lit(1)).as("n_domains"))
      s.crossJoin(broadcast(tot))
        .select(
          col("source"), col("domain_tokens"),
          expr("total_tokens div n_domains").as("budget_tokens"),
          least(col("domain_tokens"), expr("total_tokens div n_domains")).as("planned_tokens"),
          expr("(least(domain_tokens, total_tokens div n_domains) * 10000) " +
            "div greatest(domain_tokens, 1)").as("keep_bp"))
        .orderBy("source")
    },
    Some("""WITH d AS (SELECT source,
           |  len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS ntok FROM documents),
           |s AS (SELECT source, CAST(SUM(ntok) AS BIGINT) AS domain_tokens FROM d GROUP BY source),
           |t AS (SELECT CAST(SUM(domain_tokens) AS BIGINT) AS total_tokens,
           |      CAST(COUNT(*) AS BIGINT) AS n_domains FROM s)
           |SELECT source, domain_tokens,
           |  total_tokens // n_domains AS budget_tokens,
           |  LEAST(domain_tokens, total_tokens // n_domains) AS planned_tokens,
           |  (LEAST(domain_tokens, total_tokens // n_domains) * 10000)
           |    // GREATEST(domain_tokens, 1) AS keep_bp
           |FROM s, t ORDER BY source""".stripMargin))

  /** Hashed-feature linear classifier inference — the fastText-style
    * quality-model scoring pass every curated corpus runs (CCNet,
    * FineWeb-Edu): token → feature index by hashing into a fixed 4096-dim
    * space, score = Σ weight(feature), accept = score > 0. The weight
    * table stands in for trained parameters (deterministic integer stub
    * in milli-units — this container trains nothing), but the plan is the
    * real deployment shape: the MODEL IS A BROADCAST JOIN. A 4096-row
    * weight table broadcasts to every executor and the corpus side stays
    * one explode → hash → map-side hash-probe → per-doc partial sum; at
    * 100 TB the only shuffle is the doc-grain aggregate, and a
    * million-row embedding/weight table broadcasts the same way. Exact
    * integer weights end to end — the score hash-matches bit-for-bit. */
  val tQualityClf: Q = Q(
    "t_quality_clf",
    (spark, dir) => {
      val weights = spark.range(4096).select(col("id").as("fidx"),
        ((col("id") * 2654435761L) % 2001L - 1000L).as("w_milli"))
      Tables(spark, dir, "documents")
        .select(col("doc_id"),
          explode(filter(split(col("text"), " "), t => length(t) > 0)).as("tok"))
        .select(col("doc_id"),
          ((graft.ops.TextHash.polyHash(rpad(col("tok"), 4, "x"), 4)
            + length(col("tok")) * 7L) % 4096L).as("fidx"))
        .join(broadcast(weights), Seq("fidx"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_toks"), sum(col("w_milli")).as("score_milli"))
        .withColumn("accept", (col("score_milli") > 0L).cast("long"))
        .orderBy("doc_id")
    },
    Some(s"""WITH tok AS (
            |  SELECT doc_id, t.tok FROM documents,
            |    LATERAL UNNEST(string_split(text, ' ')) AS t(tok)
            |  WHERE length(t.tok) > 0),
            |f AS (SELECT doc_id,
            |    (${graft.ops.TextHash.polyHashSql("rpad(tok, 4, 'x')", 4)}
            |     + length(tok) * 7) % 4096 AS fidx FROM tok),
            |w AS (SELECT i AS fidx, (i * 2654435761) % 2001 - 1000 AS w_milli
            |      FROM range(4096) AS r(i))
            |SELECT doc_id, COUNT(*) AS n_toks,
            |  CAST(SUM(w.w_milli) AS BIGINT) AS score_milli,
            |  CAST(CASE WHEN SUM(w.w_milli) > 0 THEN 1 ELSE 0 END AS BIGINT) AS accept
            |FROM f JOIN w USING (fidx)
            |GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** Systematic weighted sampling — select ~N docs with probability
    * proportional to token mass, WITHOUT float randomness: a doc is
    * picked iff its weight interval (cum − w, cum] on the corpus's
    * cumulative-token axis contains a POSITIVE multiple of
    * step = W div N (the classic systematic/PPS rule; the implemented
    * predicate `cum div step > (cum − w) div step` tests exactly this
    * half-open interval, so the zero boundary never force-selects the
    * first document). All
    * integer arithmetic — exact in both engines — and the cumulative
    * weight runs through [[graft.ops.DistributedPrefix]] doc_id-range
    * blocks, so there is no single-partition window over the corpus
    * grain. A doc heavier than step is picked once (not ⌈w/step⌉
    * times — sampling without replacement), so the planned count is
    * ≤ N; the corpus total W moves as a one-row broadcast. This is the
    * token-budget subsampler that sits after quality scoring in a
    * training-data pipeline: budget expressed as a count, weights as
    * exact token masses, reproducible across runs and engines. */
  val sWeightedSample: Q = Q(
    "s_weighted_sample",
    (spark, dir) => {
      val sized = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          expr("cast(size(filter(split(text, ' '), x -> length(x) > 0)) as bigint)")
            .as("n_tok"))
        .localCheckpoint() // feeds bounds, total, and the prefix pass
      val bounds = sized.agg(
        min(col("doc_id")).as("blo"), max(col("doc_id")).as("bhi"))
      val total = sized.agg(sum(col("n_tok")).as("w_total"))
      graft.ops.DistributedPrefix.runningSum(
          sized.crossJoin(broadcast(bounds)),
          block = graft.ops.DistributedPrefix.rangeBucket(
            col("doc_id"), col("blo"), col("bhi"), 64),
          blockAsc = true,
          localOrder = Seq(col("doc_id")),
          value = col("n_tok"),
          out = "cum")
        .crossJoin(broadcast(total))
        .withColumn("step", expr("greatest(w_total div 50, 1L)"))
        .filter(expr("cum div step > (cum - n_tok) div step"))
        .select(col("doc_id"), col("n_tok"), col("cum"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id,
           |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS n_tok
           |  FROM documents),
           |c AS (SELECT doc_id, n_tok,
           |    CAST(SUM(n_tok) OVER (ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM d),
           |t AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS w_total FROM d)
           |SELECT doc_id, n_tok, cum
           |FROM c, t
           |WHERE cum // greatest(w_total // 50, 1) >
           |      (cum - n_tok) // greatest(w_total // 50, 1)
           |ORDER BY doc_id""".stripMargin))

  /** Temperature-scaled domain mixture: the multilingual/multi-source
    * resampling step (UNIMAX / mT5-style, temperature τ=2 ⇒ α=1/τ=0.5)
    * that upsamples small domains and downsamples large ones. Per-source
    * weight w_d = round(sqrt(char mass)·1e6) — sqrt of an integer is a
    * single correctly-rounded IEEE op, so w_d is bit-identical across
    * engines and everything downstream is EXACT INTEGER arithmetic: a
    * fixed budget of 10 000 samples is split by Hamilton's
    * largest-remainder method (base = 10000·w div W, leftover seats to
    * the largest remainders, ties to the lexicographically first
    * source), which is how you allocate an integer budget from real
    * weights without float drift. Scale shape: one corpus-grain groupBy
    * to a #sources-row frame; the ranking windows run on that aggregate
    * (source cardinality is a corpus property, not data-proportional),
    * and the weight total rides a one-row broadcast. */
  val sTemperature: Q = Q(
    "s_temperature",
    (spark, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val a = Tables(spark, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("mass"))
        .withColumn("w", round(sqrt(col("mass").cast("double")) * 1000000).cast("long"))
      val tot = a.agg(sum(col("w")).as("tw"))
      val b = a.crossJoin(broadcast(tot))
        .withColumn("weight_ppm", expr("w * 1000000 div tw"))
        .withColumn("base", expr("10000 * w div tw"))
        .withColumn("rem", expr("(10000 * w) % tw"))
      b.withColumn("rk", row_number().over(W.orderBy(col("rem").desc, col("source"))))
        .withColumn("base_total", sum(col("base")).over(W.partitionBy(lit(1))))
        .withColumn("alloc",
          col("base") + when(col("rk") <= lit(10000L) - col("base_total"), 1L).otherwise(0L))
        .select(col("source"), col("n_docs"), col("weight_ppm"), col("alloc"))
        .orderBy("source")
    },
    Some("""WITH a AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |    CAST(round(sqrt(CAST(SUM(n_chars) AS DOUBLE)) * 1000000) AS BIGINT) AS w
           |  FROM documents GROUP BY source),
           |t AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM a),
           |b AS (SELECT source, n_docs, w,
           |    CAST((w * 1000000) // tw AS BIGINT) AS weight_ppm,
           |    CAST((10000 * w) // tw AS BIGINT) AS base,
           |    CAST((10000 * w) % tw AS BIGINT) AS rem
           |  FROM a, t),
           |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
           |    CAST(SUM(base) OVER () AS BIGINT) AS base_total FROM b)
           |SELECT source, n_docs, weight_ppm,
           |  CAST(base + CASE WHEN rk <= 10000 - base_total THEN 1 ELSE 0 END AS BIGINT) AS alloc
           |FROM r ORDER BY source""".stripMargin))

  /** Deterministic cross-source dataloader interleave (round 10): assign
    * every document a global training-epoch position by fixed-stride
    * round-robin across sources — pos = (rank_within_source − 1)·n_sources
    * + source_idx − 1 — and emit the first 200 positions. This is the
    * "shuffle-free epoch order" a distributed data loader wants: any
    * worker can compute its shard's positions locally, no global sort,
    * and the order is reproducible run-to-run. Positions have gaps once
    * a source is exhausted (fixed stride, documented semantics).
    *
    * Scale shape: the per-source rank is a [[graft.ops.DistributedPrefix]]
    * grouped prefix count (doc_id-range blocks × source groups) — never a
    * window partitioned only by the bounded source key, which would
    * serialize each source's full doc grain through one task. The source
    * index comes from a triangular join over the BOUNDED distinct-source
    * frame (≤ tens of rows), broadcast back. The top-200 filter prunes on
    * rank ≤ 200 (a superset of pos < 200 since pos ≥ rank − 1) before the
    * final bounded sort. */
  val sInterleave: Q = Q(
    "s_interleave",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents").select(col("source"), col("doc_id"))
        .localCheckpoint() // feeds bounds, source frame, and the prefix pass
      val bounds = docs.agg(min(col("doc_id")).as("dlo"), max(col("doc_id")).as("dhi"))
      val srcs = docs.select(col("source")).distinct().localCheckpoint() // bounded
      val nSrc = srcs.agg(count(lit(1)).as("n_sources"))
      val srcIdx = srcs.as("a")
        .join(broadcast(srcs.as("b")), col("b.source") < col("a.source"), "left")
        .groupBy(col("a.source").as("source"))
        .agg((count(col("b.source")) + 1).as("src_idx"))
      val ranked = graft.ops.DistributedPrefix.runningSum(
        docs.crossJoin(broadcast(bounds)),
        block = graft.ops.DistributedPrefix.rangeBucket(
          col("doc_id"), col("dlo"), col("dhi"), 64),
        blockAsc = true,
        localOrder = Seq(col("doc_id")),
        value = lit(1L),
        out = "r",
        groupCols = Seq("source"))
      ranked
        .filter(col("r") <= 200)
        .join(broadcast(srcIdx), "source")
        .crossJoin(broadcast(nSrc))
        .withColumn("pos", (col("r") - 1) * col("n_sources") + col("src_idx") - 1)
        .filter(col("pos") < 200)
        .select(col("pos"), col("source"), col("doc_id"))
        .orderBy(col("pos"))
    },
    Some("""WITH d AS (
           |  SELECT source, doc_id,
           |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS r,
           |    CAST(dense_rank() OVER (ORDER BY source) AS BIGINT) AS src_idx
           |  FROM documents),
           |n AS (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources FROM documents)
           |SELECT (r - 1) * n_sources + src_idx - 1 AS pos, source, doc_id
           |FROM d, n WHERE (r - 1) * n_sources + src_idx - 1 < 200
           |ORDER BY pos""".stripMargin))

  /** Sort-free epoch shuffle (round 10): a deterministic pseudo-random
    * permutation of the corpus via an affine map pos = (a·doc_id + b)
    * mod p with p prime ≥ max id — the way a 100 TB dataloader shuffles
    * WITHOUT a global sort: any worker computes any document's epoch
    * position locally in O(1), the permutation is bijective on [0, p),
    * and a new epoch is just a new (a, b). Emits the first 100 positions
    * of epoch 1 (a=48271, b=7, the MINSTD multiplier) — reproducible
    * run-to-run, no shuffle of the data itself.
    *
    * Scale shape: map-only projection + TakeOrdered(100) — the only
    * "sort" is over the bounded output. The permutation replaces the
    * petabyte-scale sort-by-rand() that a naive shuffle would plan. */
  val sShuffleEpoch: Q = Q(
    "s_shuffle_epoch",
    (spark, dir) => {
      // p = 2^31 - 1 (prime); doc_id < p always holds for the fixture
      // id space, making the affine map injective on it.
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"))
        .withColumn("pos", (col("doc_id") * 48271L + 7L) % 2147483647L)
        .orderBy(col("pos"))
        .limit(100)
        .select(col("pos"), col("doc_id"), col("source"))
    },
    Some("""SELECT (doc_id * 48271 + 7) % 2147483647 AS pos, doc_id, source
           |FROM documents ORDER BY pos LIMIT 100""".stripMargin))

  val all: Seq[Q] = Seq(tPiiRedact, tGopherQuality, wCumeDist, dDecontam,
    sMixWeighted, tSeqPack, tRepetition, sDomainBudget, tQualityClf,
    sWeightedSample, sTemperature, sInterleave, sShuffleEpoch)
}
