package graft.queries

import graft._
import org.apache.spark.sql.functions._

/** Text analysis over `documents` (north-star ops): token counting,
  * language-ID heuristic, quality scoring, document fingerprinting.
  * All pure column expressions (codegen'd, shuffle-free scans).
  */
object TextQ {

  val tTokens: Q = Q(
    "t_tokens",
    (spark, dir) =>
      Tables(spark, dir, "documents").select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0))).cast("long").as("n_re_tokens"),
        length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
           | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
           | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_re_tokens,
           | CAST(length(text) AS BIGINT) AS n_chars
           |FROM documents ORDER BY doc_id""".stripMargin))

  // Marker-token sets for the n-gram language-ID heuristic. The synthetic
  // corpus shares one vocabulary, so these are "dialect" markers; the
  // operator shape (per-class token-hit counting + argmax) is the real one.
  private[queries] val enSet = Seq("the", "a", "fast", "slow")
  private[queries] val dbSet = Seq("table", "scan", "join", "merge", "hash")
  private[queries] val sparkSet = Seq("spark", "stream", "batch", "vector")
  private[queries] def hits(set: Seq[String]) =
    size(filter(split(col("text"), " "), t => t.isin(set: _*))).cast("long")
  private[queries] def hitsSql(set: Seq[String]) = {
    val in = set.map(s => s"'$s'").mkString(", ")
    s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ($in))) AS BIGINT)"
  }

  val tLangId: Q = Q(
    "t_langid",
    (spark, dir) =>
      Tables(spark, dir, "documents")
        .select(col("doc_id"),
          hits(enSet).as("n_en"), hits(dbSet).as("n_db"), hits(sparkSet).as("n_spark"))
        .withColumn("lang_guess",
          when(col("n_en") >= col("n_db") && col("n_en") >= col("n_spark"), "en")
            .when(col("n_db") >= col("n_spark"), "db")
            .otherwise("spark"))
        .orderBy("doc_id"),
    Some(s"""SELECT doc_id, n_en, n_db, n_spark,
            | CASE WHEN n_en >= n_db AND n_en >= n_spark THEN 'en'
            |      WHEN n_db >= n_spark THEN 'db' ELSE 'spark' END AS lang_guess
            |FROM (SELECT doc_id,
            |   ${hitsSql(enSet)} AS n_en,
            |   ${hitsSql(dbSet)} AS n_db,
            |   ${hitsSql(sparkSet)} AS n_spark
            |  FROM documents) t ORDER BY doc_id""".stripMargin))

  /** Quality scoring: length band, stopword ratio band, mean token length.
    * Ratios derived as single double divisions of exact ints. */
  val tQuality: Q = Q(
    "t_quality",
    (spark, dir) => {
      val nTok = size(split(col("text"), " ")).cast("long")
      val nStop = hits(enSet)
      val totalTokChars = (length(col("text")).cast("long") - (nTok - 1))
      Tables(spark, dir, "documents")
        .select(
          col("doc_id"),
          nTok.as("n_tokens"),
          nStop.as("n_stop"),
          (totalTokChars.cast("double") / nTok.cast("double")).as("mean_tok_len"),
          (nStop.cast("double") / nTok.cast("double")).as("stop_ratio"),
          (when(nTok.between(20, 300), 1L).otherwise(0L) +
            when(nStop * 10 >= nTok, 1L).otherwise(0L)).as("quality_score"))
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id, n_tokens, n_stop,
            | CAST(tot_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_tok_len,
            | CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
            | (CASE WHEN n_tokens BETWEEN 20 AND 300 THEN 1 ELSE 0 END
            |  + CASE WHEN n_stop * 10 >= n_tokens THEN 1 ELSE 0 END) AS quality_score
            |FROM (SELECT doc_id,
            |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
            |   ${hitsSql(enSet)} AS n_stop,
            |   CAST(length(text) AS BIGINT) - (CAST(len(string_split(text, ' ')) AS BIGINT) - 1) AS tot_chars
            |  FROM documents) t ORDER BY doc_id""".stripMargin))

  /** Document fingerprints: exact (md5), order-insensitive (md5 of sorted
    * tokens), and a short prefix fingerprint for sharding. */
  val tFingerprint: Q = Q(
    "t_fingerprint",
    (spark, dir) =>
      Tables(spark, dir, "documents").select(
        col("doc_id"),
        md5(col("text")).as("fp_exact"),
        md5(array_join(array_sort(split(col("text"), " ")), " ")).as("fp_content"),
        substring(md5(col("text")), 1, 8).as("fp_short"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, md5(text) AS fp_exact,
           | md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS fp_content,
           | substring(md5(text), 1, 8) AS fp_short
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** TF-IDF top-3 terms per document. Two aggregations (term freq per doc,
    * doc freq per term) + one join on term + a bounded per-doc window.
    *
    * Determinism: the OUTPUT is exact integers only — (tf, df, n_docs) —
    * with the ln-based score used solely to ORDER the per-doc window.
    * ln has no IEEE correct-rounding guarantee, so emitting a rounded
    * score risks a 1-ulp JVM-vs-libm divergence landing exactly on a
    * rounding boundary; an ORDERING flip instead requires two distinct
    * (tf, df) pairs whose scores differ by <1 ulp, which integer inputs
    * make practically impossible (exact ties have equal (tf, df) and are
    * broken by token).
    *
    * Scale: tf and df are partial-aggregated map-side. The df (per-token)
    * side carries NO broadcast hint — a 100 TB corpus vocabulary can
    * exceed broadcast limits, so the planner broadcasts it only while its
    * stats fit and AQE falls back to a shuffle join beyond that. The
    * one-row corpus count always broadcasts. */
  val tTfidf: Q = Q(
    "t_tfidf",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val tok = docs
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
      // tf is one row per (doc, tok) and doc_id is the table's key, so both
      // "distinct" counts are plain counts — no distinct-expand needed.
      // Materialize tf ONCE: it feeds both the df derivation and the score
      // join, and Catalyst would otherwise inline the explode + (doc,tok)
      // aggregation into each reference — two full tokenization passes
      // (seen in the round-7 executed plan). The (doc,tok) grain is the
      // natural cut: far smaller than the exploded token stream.
      val tf = tok.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val nDocs = docs.select(count(lit(1)).as("n_docs"))
      val scored = tf.join(df, "tok").crossJoin(broadcast(nDocs))
        .withColumn("score", col("tf") * log(col("n_docs") * lit(1.0) / col("df")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn").cast("long").as("rn"), col("tok"),
          col("tf"), col("df"), col("n_docs"))
        .orderBy("doc_id", "rn")
    },
    Some("""WITH tok AS (
           |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
           |t AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok WHERE tok <> '' GROUP BY 1, 2),
           |d AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY 1),
           |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
           |s AS (SELECT t.doc_id, t.tok, t.tf, d.df, n.n_docs,
           |        t.tf * ln(n.n_docs * 1.0 / d.df) AS score
           |      FROM t JOIN d USING (tok) CROSS JOIN n),
           |r AS (SELECT doc_id, tok, tf, df, n_docs,
           |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rn
           |      FROM s)
           |SELECT doc_id, CAST(rn AS BIGINT) AS rn, tok,
           |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, CAST(n_docs AS BIGINT) AS n_docs
           |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin))

  /** Word-shingle mining through the custom [[graft.functions.WordShingles]]
    * Generator (the UDTF surface): 3-gram shingles stream row-by-row out
    * of the token walk — no per-document shingle ARRAY is ever
    * materialized, unlike the `explode(transform(split(...)))` form the
    * LSH queries use (fine there: their shingle sets are capped). Per
    * source: total and distinct shingle mass, the n-gram novelty signal.
    * `ShingleGenSpec` pins the generator against the explode-of-arrays
    * formulation on randomized inputs. */
  val tShingleGen: Q = Q(
    "t_shingle_gen",
    (spark, dir) =>
      Tables(spark, dir, "documents")
        .select(col("source"),
          graft.functions.word_shingles(col("text"), 3).as("shingle"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_shingles"),
          countDistinct(col("shingle")).as("n_distinct"))
        .orderBy(col("source")),
    Some("""WITH t AS (
           |  SELECT source,
           |         list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
           |  FROM documents),
           |s AS (
           |  SELECT source, array_to_string(toks[i:i+2], ' ') AS shingle
           |  FROM t, LATERAL (SELECT UNNEST(generate_series(1, len(toks) - 2)) AS i) g)
           |SELECT source, COUNT(*) AS n_shingles,
           |       CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_distinct
           |FROM s GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Corpus-frequency LM quality proxy (the CCNet/Gopher "does this doc
    * look like the corpus" signal, integer-exact): score each document by
    * the global frequency of its tokens — `sum_freq` (sum over token
    * instances of the token's corpus count), `n_tokens`, and `n_rare`
    * (instances of tokens rarer than the corpus mean frequency, compared
    * by exact cross-multiplication cnt*vocab < total — no float
    * division). Low sum_freq/n_tokens or high n_rare flags out-of-
    * distribution documents, the unigram-LM stand-in when a real LM
    * isn't available in-engine.
    *
    * Scale: tokenization is aggregated to the (doc, tok, tf) grain once
    * and localCheckpoint'd (feeds the vocabulary rollup AND the score
    * join — same discipline as t_tfidf); the vocabulary frame is
    * vocab-sized, the totals are one broadcast row. Nothing token-
    * instance-grained ever shuffles twice. */
  val tLmScore: Q = Q(
    "t_lm_score",
    (spark, dir) => {
      val tf = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          explode(expr("filter(split(text, ' '), x -> length(x) > 0)")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val g = tf.groupBy(col("tok")).agg(sum(col("tf")).as("cnt"))
      val tot = g.agg(count(lit(1)).as("vocab"), sum(col("cnt")).as("total"))
      tf.join(g, "tok").crossJoin(broadcast(tot))
        .groupBy(col("doc_id"))
        .agg(
          sum(col("tf")).as("n_tokens"),
          sum(col("tf") * col("cnt")).as("sum_freq"),
          sum(when(col("cnt") * col("vocab") < col("total"), col("tf"))
            .otherwise(lit(0L))).as("n_rare"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (SELECT doc_id,
           |  unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS tok FROM documents),
           |g AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY tok),
           |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab, CAST(SUM(cnt) AS BIGINT) AS total FROM g)
           |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |  CAST(SUM(g.cnt) AS BIGINT) AS sum_freq,
           |  CAST(SUM(CASE WHEN g.cnt * tot.vocab < tot.total THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
           |FROM toks t JOIN g USING (tok), tot
           |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin))

  /** Pointwise-mutual-information word association: for each adjacent
    * token pair, the lift P(x,y)/(P(x)P(y)) = c_xy·N²/(B·c_x·c_y) —
    * collocation mining, the classic corpus-statistics step behind
    * phrase detection (word2vec-style "new_york" merging). All counts
    * exact integers; the lift is ONE double expression on those integers
    * with identical operand order in both engines, so the micro-rounded
    * value hashes bit-for-bit (no log — the consumer can take it). Plan:
    * two tokenize scans (unigrams + adjacent pairs — same x2 as
    * t_repetition), vocab-grain count aggregates, two shuffle joins of
    * the bigram grain against the unigram counts (vocab is sublinear in
    * corpus size; nothing here is fact-broadcast), totals as one
    * broadcast row derived from the already-aggregated counts. Min
    * support 5 + top-20 keeps the output bounded. */
  val tPmi: Q = Q(
    "t_pmi",
    (spark, dir) => {
      def toks = filter(split(lower(col("text")), " "), t => length(t) > 0)
      val uni = Tables(spark, dir, "documents")
        .select(explode(toks).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .localCheckpoint() // feeds both joins and the N total
      val nTok = uni.agg(sum(col("c")).as("n_tok"))
      val pairs = Tables(spark, dir, "documents")
        .select(toks.as("l"))
        .filter(size(col("l")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("l")) - 1),
          i => struct(element_at(col("l"), i).as("x"),
            element_at(col("l"), i + 1).as("y")))).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(count(lit(1)).as("c_xy"))
        .localCheckpoint() // feeds the B total and the join chain
      val nBig = pairs.agg(sum(col("c_xy")).as("n_big"))
      pairs.filter(col("c_xy") >= 5)
        .join(uni.select(col("tok").as("x"), col("c").as("c_x")), Seq("x"))
        .join(uni.select(col("tok").as("y"), col("c").as("c_y")), Seq("y"))
        .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBig))
        .select(concat(col("x"), lit(" "), col("y")).as("bigram"),
          col("c_xy"), col("c_x"), col("c_y"),
          round(col("c_xy").cast("double") * col("n_tok") * col("n_tok")
            / (col("n_big").cast("double") * col("c_x") * col("c_y"))
            * 1000000).cast("long").as("lift_micro"))
        .orderBy(col("lift_micro").desc, col("bigram"))
        .limit(20)
    },
    Some("""WITH t AS (SELECT list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS l
           |          FROM documents),
           |uni AS (SELECT u.tok, COUNT(*) AS c
           |        FROM t, LATERAL UNNEST(l) AS u(tok) GROUP BY 1),
           |nt AS (SELECT SUM(c) AS n_tok FROM uni),
           |pairs AS (SELECT u.x, u.y, COUNT(*) AS c_xy FROM (
           |    SELECT unnest([{'x': l[i], 'y': l[i+1]} FOR i IN range(1, len(l))]) AS u
           |    FROM t WHERE len(l) >= 2) GROUP BY 1, 2),
           |nb AS (SELECT SUM(c_xy) AS n_big FROM pairs)
           |SELECT p.x || ' ' || p.y AS bigram, p.c_xy,
           |  ux.c AS c_x, uy.c AS c_y,
           |  CAST(round(CAST(p.c_xy AS DOUBLE) * nt.n_tok * nt.n_tok
           |    / (CAST(nb.n_big AS DOUBLE) * ux.c * uy.c) * 1000000) AS BIGINT) AS lift_micro
           |FROM pairs p
           |JOIN uni ux ON ux.tok = p.x
           |JOIN uni uy ON uy.tok = p.y, nt, nb
           |WHERE p.c_xy >= 5
           |ORDER BY lift_micro DESC, bigram LIMIT 20""".stripMargin))

  /** BM25 retrieval: top-5 documents per query for a fixed multi-term
    * query set (k1 = 6/5, b = 3/4). With those rationals the per-term
    * weight is ln((2N−2df+1)/(2df+1)) · 22·tf·T / (10·tf·T + 3·T + 9·dl·N)
    * — every ln/division argument an EXACT integer (N docs, T total
    * tokens, df, tf, dl), so each engine evaluates the same fixed IEEE
    * chain and only the ln's last-ulp can differ cross-engine. The
    * per-document score sums those weights over matched terms via an
    * ordered fold (array_sort + left fold from 0.0 on both engines), so
    * equal-profile documents get identical sums within an engine and the
    * doc_id tiebreak decides consistently; like t_tfidf the score is
    * ORDERING-ONLY — the output carries exact integers (matched terms,
    * tf sum, doc length).
    *
    * Scale: tf is the checkpointed (doc, tok) grain (feeds df, dl, and
    * the match join — one tokenize pass, not three); the query table
    * broadcasts (it is fixed-size by construction); df joins at the
    * token grain with no broadcast hint (vocabulary may exceed broadcast
    * limits at corpus scale); corpus totals are one broadcast row. The
    * rank filter sits directly above a single Window ordered by an
    * attribute → WindowGroupLimit (map-side per-query top-k). Integer
    * magnitudes: 22·tf·T stays under 2^53 up to T ≈ 4·10^14 corpus
    * tokens; beyond that, divide the weight through by T (the ratio
    * dl·N/T is then the only rational) before widening further. */
  val tBm25: Q = Q(
    "t_bm25",
    (spark, dir) => {
      import spark.implicits._
      val queries = Seq(
        ("q1", "fast"), ("q1", "join"),
        ("q2", "window"), ("q2", "agg"), ("q2", "scan"),
        ("q3", "customer"), ("q3", "slow")).toDF("qid", "tok")
      def toks = filter(split(lower(col("text")), " "), t => length(t) > 0)
      val tf = Tables(spark, dir, "documents")
        .select(col("doc_id"), explode(toks).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        .localCheckpoint() // feeds df, dl, and the match join
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val tot = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_tok"))
      val termW =
        log((lit(2L) * col("n_docs") - lit(2L) * col("df") + lit(1L)).cast("double") /
          (lit(2L) * col("df") + lit(1L)).cast("double")) *
          (lit(22L) * col("tf") * col("t_tok")).cast("double") /
          (lit(10L) * col("tf") * col("t_tok") + lit(3L) * col("t_tok") +
            lit(9L) * col("dl") * col("n_docs")).cast("double")
      val perDoc = tf.join(broadcast(queries), Seq("tok"))
        .join(dfreq, Seq("tok"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(tot))
        .withColumn("s", termW)
        .groupBy(col("qid"), col("doc_id"))
        .agg(count(lit(1)).as("matched"), sum(col("tf")).as("tf_sum"),
          min(col("dl")).as("dl"),
          aggregate(array_sort(collect_list(col("s"))), lit(0.0),
            (acc, x) => acc + x).as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
      perDoc.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("rn").cast("long").as("rn"), col("doc_id"),
          col("matched"), col("tf_sum"), col("dl"))
        .orderBy("qid", "rn")
    },
    Some("""WITH q(qid, tok) AS (VALUES ('q1','fast'), ('q1','join'),
           |    ('q2','window'), ('q2','agg'), ('q2','scan'),
           |    ('q3','customer'), ('q3','slow')),
           |tok AS (SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
           |          t -> len(t) > 0)) AS tok FROM documents),
           |t AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
           |d AS (SELECT tok, COUNT(*) AS df FROM t GROUP BY 1),
           |l AS (SELECT doc_id, SUM(tf) AS dl FROM t GROUP BY 1),
           |n AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS t_tok FROM l),
           |m AS (SELECT q.qid, t.doc_id, t.tf, l.dl,
           |        ln(CAST(2*n.n_docs - 2*d.df + 1 AS DOUBLE) / CAST(2*d.df + 1 AS DOUBLE))
           |          * CAST(22 * t.tf * n.t_tok AS DOUBLE)
           |          / CAST(10*t.tf*n.t_tok + 3*n.t_tok + 9*l.dl*n.n_docs AS DOUBLE) AS s
           |      FROM t JOIN q USING (tok) JOIN d USING (tok) JOIN l USING (doc_id), n),
           |p AS (SELECT qid, doc_id, COUNT(*) AS matched, SUM(tf) AS tf_sum, MIN(dl) AS dl,
           |        list_reduce(list_sort(list(s)), (acc, x) -> acc + x) AS score
           |      FROM m GROUP BY 1, 2),
           |r AS (SELECT qid, doc_id, matched, tf_sum, dl,
           |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rn
           |      FROM p)
           |SELECT qid, CAST(rn AS BIGINT) AS rn, doc_id,
           |  CAST(matched AS BIGINT) AS matched, CAST(tf_sum AS BIGINT) AS tf_sum,
           |  CAST(dl AS BIGINT) AS dl
           |FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin))

  /** One BPE-trainer merge iteration: the adjacent-symbol-pair statistic
    * that drives byte-pair-encoding tokenizer training. The real trainer
    * trick is the GRAIN: pair counts come from the frequency-weighted
    * VOCABULARY (distinct token → corpus count), not from re-scanning the
    * corpus — one corpus-grain shuffle collapses 100 TB of text to a
    * vocab-size frame, then per-token char pairs explode a frame bounded
    * by vocab × token length. A token containing a pair twice contributes
    * twice its frequency (position explode, not distinct pairs), exactly
    * like the reference BPE count. Output: top-20 merge candidates by
    * (weighted count, pair) with the number of distinct vocab types each
    * merge touches; top-k plans as TakeOrderedAndProject over the
    * charset²-bounded pair grain, never a global sort. Applying the
    * winning merge is a replace over the vocab frame — the next
    * iteration re-runs the same plan on the updated vocab. */
  val tBpeStep: Q = Q(
    "t_bpe_step",
    (spark, dir) => {
      val vocab = Tables(spark, dir, "documents")
        .select(explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      vocab.filter(length(col("tok")) >= 2)
        .select(col("tok"), col("freq"),
          explode(sequence(lit(1), length(col("tok")) - 1)).as("i"))
        .select(col("tok"), col("freq"),
          expr("substr(tok, i, 1)").as("l"), expr("substr(tok, i + 1, 1)").as("r"))
        .groupBy(col("l"), col("r"))
        .agg(sum(col("freq")).as("pair_count"), countDistinct(col("tok")).as("n_types"))
        .orderBy(col("pair_count").desc, col("l"), col("r"))
        .limit(20)
    },
    Some("""WITH v AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM (
           |    SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
           |  WHERE tok <> '' GROUP BY tok),
           |p AS (SELECT substr(tok, CAST(i AS INTEGER), 1) AS l,
           |    substr(tok, CAST(i AS INTEGER) + 1, 1) AS r, tok, freq
           |  FROM v, unnest(generate_series(1, length(tok) - 1)) AS t(i)
           |  WHERE length(tok) >= 2)
           |SELECT l, r, CAST(SUM(freq) AS BIGINT) AS pair_count,
           |  CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types
           |FROM p GROUP BY l, r ORDER BY pair_count DESC, l, r LIMIT 20""".stripMargin))

  /** Skip-gram co-occurrence mining (round 10): ordered token pairs
    * within a 3-token forward window — the word2vec/GloVe context
    * statistic one step past adjacent bigrams. Pairs are built by a pure
    * nested array expression (sequence + transform + flatten — no
    * window, no positional self-join), so the whole pair space is a
    * bounded ≤3× explode of the token grain feeding one count
    * aggregate: the same one-shuffle shape as t_bigrams at any corpus
    * size. Top-20 by frequency, ties by pair text. */
  val tSkipgram: Q = Q(
    "t_skipgram",
    (spark, dir) => {
      val toks = split(lower(col("text")), " ")
      Tables(spark, dir, "documents")
        .select(toks.as("l"))
        .filter(size(col("l")) >= 2)
        .select(explode(flatten(transform(sequence(lit(1), size(col("l")) - 1),
          i => transform(sequence(i + 1, least(i + 3, size(col("l")))),
            j => concat(element_at(col("l"), i), lit(" "), element_at(col("l"), j))))))
          .as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(20)
    },
    Some("""WITH l AS (SELECT string_split(lower(text), ' ') AS l
           |          FROM documents WHERE len(string_split(lower(text), ' ')) >= 2),
           |b AS (SELECT unnest(flatten(list_transform(range(1, len(l)),
           |        i -> list_transform(range(i + 1, least(i + 3, len(l)) + 1),
           |               j -> l[i] || ' ' || l[j])))) AS pair FROM l)
           |SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
           |FROM b GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin))

  /** BPE merge-table APPLICATION (round 10) — the other half of the
    * tokenizer t_bpeStep learns: apply a fixed ranked merge list to the
    * corpus and report the resulting subword-symbol frequencies. Each
    * alpha token is exploded to spaced characters ("the" → "t h e"),
    * then the merge list folds over it IN RANK ORDER as literal
    * `replace` calls — both engines scan left-to-right non-overlapping,
    * so greedy merge application is bit-deterministic, and later merges
    * compose with earlier ones ("t h"→"th" enables "th e"→"the")
    * exactly as a real BPE encoder's merge loop does. The merge table is
    * a fixed literal (a learned table would be a broadcast list feeding
    * the same fold).
    *
    * Scale shape: pure per-row string map + one explode + one count
    * aggregate — embarrassingly parallel, map-side combinable, no join;
    * the symbol vocabulary (output) is bounded by the merge table, not
    * the corpus. */
  val tBpeApply: Q = Q(
    "t_bpe_apply",
    (spark, dir) => {
      val merges = Seq(
        "t h" -> "th", "th e" -> "the", "i n" -> "in", "a n" -> "an",
        "an d" -> "and", "e r" -> "er", "o n" -> "on", "r e" -> "re")
      val spaced = trim(regexp_replace(col("tok"), "(.)", "$1 "))
      val mergedCol = merges.foldLeft(spaced) { case (c, (a, b)) =>
        org.apache.spark.sql.functions.replace(c, lit(a), lit(b))
      }
      Tables(spark, dir, "documents")
        .select(explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok").rlike("^[a-z]+$"))
        .select(explode(split(mergedCol, " ")).as("symbol"))
        .groupBy(col("symbol"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("symbol"))
        .limit(40)
    },
    Some("""WITH toks AS (
           |  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
           |alpha AS (
           |  SELECT tok FROM toks WHERE regexp_full_match(tok, '[a-z]+')),
           |sp AS (
           |  SELECT trim(regexp_replace(tok, '(.)', '\1 ', 'g')) AS s FROM alpha),
           |m AS (
           |  SELECT replace(replace(replace(replace(replace(replace(replace(replace(
           |    s, 't h', 'th'), 'th e', 'the'), 'i n', 'in'), 'a n', 'an'),
           |    'an d', 'and'), 'e r', 'er'), 'o n', 'on'), 'r e', 're') AS s
           |  FROM sp),
           |sym AS (SELECT unnest(string_split(s, ' ')) AS symbol FROM m)
           |SELECT symbol, COUNT(*) AS freq FROM sym
           |GROUP BY 1 ORDER BY freq DESC, symbol LIMIT 40""".stripMargin))

  /** Ingestion-order novelty curve: per document, the fraction of its
    * distinct 6-char shingles first seen IN that document (first-seen =
    * owned by the minimum doc_id carrying the shingle) — the
    * diminishing-returns signal corpus curation watches: novelty_bp
    * decaying toward 0 means new data is re-treading old n-grams and
    * the crawl should move on. Cousin of d_span_dedup's first-owner
    * attribution, at the shingle-set grain instead of fixed blocks.
    *
    * Plan: one fused shingle-hash pass ([[graft.functions.shingle_hashes]])
    * to the distinct (doc, h) grain, checkpointed; first owners are one
    * min-agg over it (shuffle carries 8-byte hashes); per-doc totals
    * and owned counts are two more aggs over the SAME materialization,
    * joined at the bounded doc grain. Novelty in truncating bp. */
  val tNovelty: Q = Q(
    "t_novelty",
    (spark, dir) => {
      val dh = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.shingle_hashes(col("text"), graft.ops.TextHash.ShingleLen)).as("h"))
        .distinct()
        .localCheckpoint()
      val totals = dh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
      val owned = dh.groupBy(col("h")).agg(min(col("doc_id")).as("owner"))
        .groupBy(col("owner").as("doc_id")).agg(count(lit(1)).as("n_first"))
      totals.join(owned, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_shingles"),
          coalesce(col("n_first"), lit(0L)).as("n_first"))
        .withColumn("novelty_bp", expr("n_first * 10000 div n_shingles"))
        .orderBy("doc_id")
    },
    Some {
      import graft.ops.TextHash._
      s"""WITH dh AS (
         |  SELECT DISTINCT doc_id, ${polyHashSql("sh", ShingleLen)} AS h FROM (
         |    SELECT doc_id, ${shinglesSqlFrom(ShingleLen)} AS sh FROM documents)),
         |totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM dh GROUP BY 1),
         |owned AS (
         |  SELECT owner AS doc_id, COUNT(*) AS n_first FROM (
         |    SELECT h, MIN(doc_id) AS owner FROM dh GROUP BY 1) GROUP BY 1)
         |SELECT t.doc_id, t.n_shingles,
         |       COALESCE(o.n_first, 0) AS n_first,
         |       COALESCE(o.n_first, 0) * 10000 // t.n_shingles AS novelty_bp
         |FROM totals t LEFT JOIN owned o ON t.doc_id = o.doc_id
         |ORDER BY t.doc_id""".stripMargin
    })

  val all: Seq[Q] = Seq(tTokens, tLangId, tQuality, tFingerprint, tTfidf, tShingleGen, tLmScore,
    tPmi, tBm25, tBpeStep, tSkipgram, tBpeApply, tNovelty)
}
