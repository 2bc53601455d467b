package graft.queries

import graft._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus canonicalization operators (round 4): text normalization and
  * URL canonical-form dedup — the two cleanups every crawl-derived
  * training corpus runs before any dedup/quality stage (raw text mixes
  * decomposed accents/controls; the same page is fetched under many URL
  * spellings).
  *
  * Both are map-only projections feeding one hash aggregation — no joins,
  * no skew surface, linear at 100 TB.
  */
object CorpusQ {

  /** Unicode-normalize the corpus via [[graft.functions.normalize_text]]
    * (fused NFC + control-strip + space-collapse + trim, codegen'd). The
    * input is made adversarial on purpose: a suffix with a combining
    * accent (e + U+0301 must COMPOSE to é), a tab, a double space and a
    * BEL control is appended, so the oracle compare proves real NFC
    * composition and control handling, not a no-op on clean ASCII. */
  val tNormalize: Q = Q(
    "t_normalize",
    (spark, dir) =>
      Tables(spark, dir, "documents")
        .select(col("doc_id"),
          graft.functions.normalize_text(
            concat(col("text"),
              lit("\tcafe\u0301  x\u0007y"))).as("norm_text")) // decomposed é, BEL
        .withColumn("n_chars", length(col("norm_text")).cast("long"))
        .orderBy("doc_id"),
    Some("""WITH n AS (
           |  SELECT doc_id,
           |    trim(regexp_replace(regexp_replace(
           |      nfc_normalize(text || chr(9) || 'cafe' || chr(769) || '  x' || chr(7) || 'y'),
           |      '[\x00-\x1F\x7F]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
           |  FROM documents)
           |SELECT doc_id, norm_text, CAST(length(norm_text) AS BIGINT) AS n_chars
           |FROM n ORDER BY doc_id""".stripMargin))

  // Synthesized messy URL per doc (the documents table has no URL column):
  // uppercase scheme/host, www prefix, default port, tracking params and a
  // fragment — every canonicalization hazard in one string. doc_ids that
  // agree mod (40,7,5) collapse to the same canonical URL, so the dedup
  // aggregation has real work.
  private def rawUrl: Column =
    concat(
      lit("HTTPS://WWW.Site"), (col("doc_id") % 40).cast("string"),
      lit(".COM:443/Path/"), (col("doc_id") % 7).cast("string"),
      lit("/?utm_source=feed&id="), (col("doc_id") % 5).cast("string"),
      lit("&utm_med=em#sec"), (col("doc_id") % 3).cast("string"))

  /** URL canonicalization + dedup by canonical form: lowercase scheme and
    * host, strip `www.`, default ports, tracking (`utm_*`) params, the
    * fragment and trailing slash, then keep the minimum doc_id per
    * canonical URL. Pure regexp_extract/regexp_replace chains (RE2-safe —
    * no lookarounds, no backrefs in replacements) so Spark's Java regex
    * and DuckDB's RE2 produce identical strings. */
  val dUrlCanon: Q = Q(
    "d_url_canon",
    (spark, dir) => {
      val url = rawUrl
      val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
      val host = regexp_replace(regexp_replace(
        lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1)),
        "^www\\.", ""), ":(443|80)$", "")
      val path = regexp_replace(
        regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1), "/$", "")
      val query = regexp_replace(
        regexp_replace(regexp_extract(url, "\\?([^#]*)", 1), "(^|&)utm_[^&]*", ""),
        "^&+", "")
      val canon = concat(scheme, lit("://"), host, path,
        when(query === "", lit("")).otherwise(concat(lit("?"), query)))
      Tables(spark, dir, "documents")
        .select(col("doc_id"), canon.as("canon_url"))
        .groupBy(col("canon_url"))
        .agg(count(lit(1)).as("n_dupes"), min(col("doc_id")).as("keeper_doc"))
        .orderBy("canon_url")
    },
    Some("""WITH u AS (
           |  SELECT doc_id,
           |    'HTTPS://WWW.Site' || CAST(doc_id % 40 AS VARCHAR) ||
           |    '.COM:443/Path/' || CAST(doc_id % 7 AS VARCHAR) ||
           |    '/?utm_source=feed&id=' || CAST(doc_id % 5 AS VARCHAR) ||
           |    '&utm_med=em#sec' || CAST(doc_id % 3 AS VARCHAR) AS url
           |  FROM documents),
           |q AS (
           |  SELECT doc_id, url,
           |    regexp_replace(regexp_replace(
           |      regexp_extract(url, '\?([^#]*)', 1), '(^|&)utm_[^&]*', '', 'g'),
           |      '^&+', '') AS qq
           |  FROM u),
           |c AS (
           |  SELECT doc_id,
           |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://' ||
           |    regexp_replace(regexp_replace(
           |      lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
           |      '^www\.', ''), ':(443|80)$', '') ||
           |    regexp_replace(regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), '/$', '') ||
           |    CASE WHEN qq = '' THEN '' ELSE '?' || qq END AS canon_url
           |  FROM q)
           |SELECT canon_url, COUNT(*) AS n_dupes, MIN(doc_id) AS keeper_doc
           |FROM c GROUP BY canon_url ORDER BY canon_url""".stripMargin))

  /** Strided token-window chunking (RAG / context-window prep): every
    * document splits into windows of 30 tokens advancing by 20 (10-token
    * overlap), the standard retrieval-chunking shape; the complement of
    * t_seq_pack (which packs docs INTO a budget, while this splits docs
    * OVER one). Pure per-row explode — chunk starts come from a
    * `sequence` over the token count, the slice/join are array ops on the
    * one tokenized column; no shuffle, no per-chunk re-tokenization.
    * Empty documents (and all-space ones) produce no chunks on either
    * engine because the single candidate start 1 fails `start <= n`.
    * Output is exact integers + the chunk text itself; the deterministic
    * output sort is the only exchange. */
  val tChunkOverlap: Q = Q(
    "t_chunk_overlap",
    (spark, dir) => {
      val W = 30
      val S = 20
      Tables(spark, dir, "documents")
        .select(col("doc_id"),
          filter(split(col("text"), " "), t => length(t) > 0).as("l"))
        .select(col("doc_id"), col("l"), size(col("l")).as("n"))
        .select(col("doc_id"), col("l"), col("n"),
          explode(sequence(lit(1), greatest(col("n"), lit(1)), lit(S))).as("start"))
        .filter(col("start") <= col("n"))
        .select(
          col("doc_id"),
          (((col("start") - 1) / S) + 1).cast("long").as("chunk_idx"),
          col("start").cast("long").as("start_tok"),
          least(col("start") + (W - 1), col("n")).cast("long").as("end_tok"),
          (least(col("start") + (W - 1), col("n")) - col("start") + 1)
            .cast("long").as("n_tok"),
          array_join(slice(col("l"), col("start"), lit(W)), " ").as("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    },
    Some("""WITH t AS (SELECT doc_id,
           |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS l
           |  FROM documents),
           |s AS (SELECT doc_id, l, len(l) AS n,
           |        unnest(generate_series(1, greatest(len(l), 1), 20)) AS start
           |      FROM t)
           |SELECT doc_id,
           |  CAST((start - 1) // 20 + 1 AS BIGINT) AS chunk_idx,
           |  CAST(start AS BIGINT) AS start_tok,
           |  CAST(least(start + 29, n) AS BIGINT) AS end_tok,
           |  CAST(least(start + 29, n) - start + 1 AS BIGINT) AS n_tok,
           |  array_to_string(l[start : least(start + 29, n)], ' ') AS chunk_text
           |FROM s WHERE start <= n
           |ORDER BY doc_id, chunk_idx""".stripMargin))

  /** Tokenizer-vocabulary coverage audit (round 10): fix the vocab to the
    * corpus's top-1000 tokens (ties broken by token text), then report per
    * source the occurrence-weighted coverage — total token occurrences,
    * occurrences covered by the vocab, and the OOV rate in basis points
    * (integer division, exact). This is the pre-training question "what
    * fraction of this source will the tokenizer shatter into bytes?".
    *
    * Scale shape: one token-grain scan builds corpus counts; the vocab is
    * a BOUNDED top-k of that aggregate (1000 rows, broadcast); the
    * coverage pass re-aggregates the same checkpointed (source, tok, n)
    * grain against the broadcast vocab — per-source output is bounded by
    * the source count. Nothing all-pairs, nothing single-task: at 100 TB
    * the only growing grain is (source, tok), a hash aggregate. */
  val tVocabCoverage: Q = Q(
    "t_vocab_coverage",
    (spark, dir) => {
      val srcTok = Tables(spark, dir, "documents")
        .select(col("source"), explode(split(lower(col("text")), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint() // feeds both the vocab build and the coverage pass
      val vocab = srcTok
        .groupBy(col("tok"))
        .agg(sum(col("n")).as("corpus_n"))
        .orderBy(col("corpus_n").desc, col("tok"))
        .limit(1000)
        .select(col("tok").as("v_tok"))
      srcTok
        .join(broadcast(vocab), col("tok") === col("v_tok"), "left")
        .groupBy(col("source"))
        .agg(sum(col("n")).as("n_occ"),
          sum(when(col("v_tok").isNotNull, col("n")).otherwise(lit(0L))).as("n_covered"))
        .withColumn("oov_bp",
          ((col("n_occ") - col("n_covered")) * 10000 / col("n_occ")).cast("long"))
        .orderBy(col("source"))
    },
    Some("""WITH st AS (
           |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
           |  FROM (SELECT source, unnest(list_filter(string_split(lower(text), ' '),
           |                x -> len(x) > 0)) AS tok FROM documents) t
           |  GROUP BY source, tok),
           |vocab AS (
           |  SELECT tok FROM (SELECT tok, SUM(n) AS corpus_n FROM st GROUP BY tok)
           |  ORDER BY corpus_n DESC, tok LIMIT 1000)
           |SELECT source,
           |  CAST(SUM(n) AS BIGINT) AS n_occ,
           |  CAST(SUM(CASE WHEN tok IN (SELECT tok FROM vocab) THEN n ELSE 0 END) AS BIGINT) AS n_covered,
           |  CAST((SUM(n) - SUM(CASE WHEN tok IN (SELECT tok FROM vocab) THEN n ELSE 0 END)) * 10000
           |       // SUM(n) AS BIGINT) AS oov_bp
           |FROM st GROUP BY source ORDER BY source""".stripMargin))

  val all: Seq[Q] = Seq(tNormalize, dUrlCanon, tChunkOverlap, tVocabCoverage)
}
