package graft.queries

import graft._
import graft.ops.TextHash._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deduplication family over `documents` (north-star ops): exact dedup,
  * token-multiset dedup, exact n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: exact/token dedup are one hash-aggregate over the
  * content fingerprint — the 100 TB shape (shuffle once on a 16-byte
  * key, never on the full text). The pairwise ops (jaccard / minhash /
  * simhash verification joins) run on a bounded candidate subset here
  * (doc_id < 100) so the bench measures operator cost, not an O(n^2)
  * blowup; at scale the LSH band-bucket join IS the pruning mechanism
  * (candidates only within equal band signatures).
  */
object DedupQ {

  private def docs100(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").filter(col("doc_id") < 100).select(col("doc_id"), col("text"))

  // Exact dedup on content hash: representative = min doc_id per distinct text.
  val dExact: Q = Q(
    "d_exact_dedup",
    (spark, dir) =>
      Tables(spark, dir, "documents")
        .groupBy(md5(col("text")).as("text_md5"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy("text_md5"),
    Some("""SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
           |FROM documents GROUP BY md5(text) ORDER BY text_md5""".stripMargin))

  // Order-insensitive dedup: fingerprint = md5 of the sorted token list.
  val dTokenDedup: Q = Q(
    "d_token_dedup",
    (spark, dir) =>
      Tables(spark, dir, "documents")
        .groupBy(md5(array_join(array_sort(split(col("text"), " ")), " ")).as("token_fp"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy("token_fp"),
    Some("""SELECT md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS token_fp,
           | MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
           |FROM documents GROUP BY 1 ORDER BY token_fp""".stripMargin))

  /** Exact n-gram Jaccard near-dup pairs (threshold 0.25, integer
    * cross-multiplied compare — no float division). */
  val dNgramJaccard: Q = Q(
    "d_ngram_jaccard",
    (spark, dir) => {
      val d = docs100(spark, dir)
      // Materialize the shingle set once: it feeds both self-join sides
      // and the per-doc counts (the shingling pass ran 4x in the round-7
      // executed plan — Catalyst inlines shared frames per reference).
      val sh = d.select(col("doc_id"), explode(shingles(col("text"), 5)).as("sh"))
        .localCheckpoint()
      val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val shared = sh.as("a").join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
      shared
        .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .filter(col("shared") * 100 >= lit(25) * (col("na") + col("nb") - col("shared")))
        .select(col("doc_a"), col("doc_b"), col("shared"), col("na"), col("nb"))
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
            |sh AS (SELECT DISTINCT doc_id, ${"unnest(list_transform(range(1, length(text) - 3), i -> substring(text, CAST(i AS INT), 5)))"} AS sh FROM d),
            |counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            |shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
            |           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            |           GROUP BY 1, 2)
            |SELECT doc_a, doc_b, shared, ca.n AS na, cb.n AS nb
            |FROM shared JOIN counts ca ON ca.doc_id = doc_a JOIN counts cb ON cb.doc_id = doc_b
            |WHERE shared * 100 >= 25 * (ca.n + cb.n - shared)
            |ORDER BY doc_a, doc_b""".stripMargin))

  /** MinHash + LSH candidate pairs. Spark side is the real scale shape:
    * shingle -> polynomial hash -> 12 min-hashes -> 6 band signatures ->
    * shuffle on (band, signature) -> pairs within buckets. The oracle is
    * the semantically-equal O(n^2) formulation (fine at oracle scale). */
  val dMinhashLsh: Q = Q(
    "d_minhash_lsh",
    (spark, dir) => {
      val d = docs100(spark, dir)
      // fused one-pass shingle hashing (graft.functions.ShingleHashes);
      // hash-space dedup is min-agg-safe (scaladoc there)
      val sh = d.select(col("doc_id"),
        explode(graft.functions.shingle_hashes(col("text"), ShingleLen)).as("h0"))
      val mins = sh.groupBy(col("doc_id"))
        .agg(
          min(minHashOf(col("h0"), 0)).as("mh0"),
          (1 until NumHashes).map(j => min(minHashOf(col("h0"), j)).as(s"mh$j")): _*)
      val bandSigs = (0 until Bands).map { b =>
        val cols = (b * RowsPerBand until (b + 1) * RowsPerBand).map(j => col(s"mh$j").cast("string"))
        struct(lit(b).as("band"), concat_ws(",", cols: _*).as("sig"))
      }
      // Checkpoint the band signatures: both self-join sides read one
      // materialization instead of re-running shingle+minhash per side.
      val buckets = mins.select(col("doc_id"), explode(array(bandSigs: _*)).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
        .localCheckpoint()
      buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    },
    Some {
      val minExprs = (0 until NumHashes)
        .map(j => s"MIN(${minHashOfSql("h0", j)}) AS mh$j").mkString(",\n  ")
      val bandEq = (0 until Bands).map { b =>
        (b * RowsPerBand until (b + 1) * RowsPerBand)
          .map(j => s"a.mh$j = b.mh$j").mkString("(", " AND ", ")")
      }.mkString("(", " OR ", ")")
      s"""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
         |sh AS (SELECT DISTINCT doc_id, ${shinglesSqlFrom(ShingleLen)} AS sh FROM d),
         |h AS (SELECT doc_id, ${polyHashSql("sh", ShingleLen)} AS h0 FROM sh),
         |mins AS (SELECT doc_id,
         |  $minExprs
         |  FROM h GROUP BY doc_id)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM mins a JOIN mins b ON a.doc_id < b.doc_id AND $bandEq
         |ORDER BY doc_a, doc_b""".stripMargin
    })

  /** 16-bit SimHash over tokens; near-dup = hamming distance <= 2.
    * Token hash = polynomial over the token right-padded to 4 chars,
    * plus a length term (keeps it cheap AND expressible in the oracle). */
  val dSimhash: Q = Q(
    "d_simhash",
    (spark, dir) => {
      val d = docs100(spark, dir)
      val tok = d.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("th",
          (polyHash(rpad(col("tok"), 4, "x"), 4) + length(col("tok")) * 7L) % 65536L)
      val bits = tok.select(col("doc_id"), col("th"),
        explode(sequence(lit(0), lit(15))).as("b"))
        .withColumn("contrib",
          when(expr("shiftright(th, cast(b as int)) % 2") === 1, 1L).otherwise(-1L))
      val fp = bits.groupBy(col("doc_id"), col("b"))
        .agg(sum(col("contrib")).as("s"))
        .groupBy(col("doc_id"))
        .agg(sum(when(col("s") > 0,
          expr("cast(shiftleft(cast(1 as bigint), cast(b as int)) as bigint)")).otherwise(0L)).as("fp"))
        // one fingerprint materialization for both self-join sides
        .localCheckpoint()
      fp.as("a").join(fp.as("b"), col("a.doc_id") < col("b.doc_id"))
        .filter(bit_count(col("a.fp").bitwiseXOR(col("b.fp"))) <= 2)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).cast("long").as("hamming"))
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
            |tok AS (SELECT doc_id,
            |  (${polyHashSql("rpad(t.tok, 4, 'x')", 4)} + length(t.tok) * 7) % 65536 AS th
            |  FROM d, unnest(string_split(d.text, ' ')) AS t(tok)),
            |bits AS (SELECT doc_id, b.b AS b,
            |    CASE WHEN (th >> CAST(b.b AS INT)) & 1 = 1 THEN 1 ELSE -1 END AS contrib
            |  FROM tok, unnest(range(0, 16)) AS b(b)),
            |sums AS (SELECT doc_id, b, SUM(contrib) AS s FROM bits GROUP BY doc_id, b),
            |fp AS (SELECT doc_id,
            |    CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS fp
            |  FROM sums GROUP BY doc_id)
            |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
            |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
            |WHERE bit_count(xor(a.fp, b.fp)) <= 2
            |ORDER BY doc_a, doc_b""".stripMargin))

  /** Full-corpus LSH buckets (NO doc_id bound): every document shingled,
    * minhashed, band-bucketed; output = the collision buckets (band, sig,
    * size, representative). Linear-size output regardless of how dense
    * the near-dup clusters are — the exact aggregation a 100 TB dedup
    * keeps (bucket -> keep-min), with the pair expansion left to the
    * verification stage. The oracle runs the SAME bucket formulation
    * (not the O(n^2) pair check), both sides built from TextHash's
    * shared Spark/SQL builders.
    */
  val dLshBuckets: Q = Q(
    "d_lsh_buckets",
    (spark, dir) => {
      val d = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
      val sh = d.select(col("doc_id"),
        explode(graft.functions.shingle_hashes(col("text"), ShingleLen)).as("h0"))
      val mins = sh.groupBy(col("doc_id"))
        .agg(
          min(minHashOf(col("h0"), 0)).as("mh0"),
          (1 until NumHashes).map(j => min(minHashOf(col("h0"), j)).as(s"mh$j")): _*)
      val bandSigs = (0 until Bands).map { b =>
        val cols = (b * RowsPerBand until (b + 1) * RowsPerBand).map(j => col(s"mh$j").cast("string"))
        struct(lit(b).as("band"), concat_ws(",", cols: _*).as("sig"))
      }
      mins.select(col("doc_id"), explode(array(bandSigs: _*)).as("bs"))
        .groupBy(col("bs.band").as("band"), col("bs.sig").as("sig"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc"))
        .filter(col("n_docs") > 1)
        .orderBy("band", "sig")
    },
    Some {
      val minExprs = (0 until NumHashes)
        .map(j => s"MIN(${minHashOfSql("h0", j)}) AS mh$j").mkString(",\n  ")
      val bandRows = (0 until Bands).map { b =>
        val sig = (b * RowsPerBand until (b + 1) * RowsPerBand)
          .map(j => s"CAST(mh$j AS VARCHAR)").mkString(" || ',' || ")
        s"SELECT doc_id, $b AS band, $sig AS sig FROM mins"
      }.mkString("\nUNION ALL\n")
      s"""WITH sh AS (SELECT DISTINCT doc_id, ${shinglesSqlFrom(ShingleLen)} AS sh
         |            FROM documents),
         |h AS (SELECT doc_id, ${polyHashSql("sh", ShingleLen)} AS h0 FROM sh),
         |mins AS (SELECT doc_id,
         |  $minExprs
         |  FROM h GROUP BY doc_id),
         |buckets AS ($bandRows)
         |SELECT band, sig, COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc
         |FROM buckets GROUP BY band, sig HAVING COUNT(*) > 1
         |ORDER BY band, sig""".stripMargin
    })

  /** Content-defined chunking (CDC) dedup: split each document into
    * variable-length chunks at ROLLING-HASH boundaries (a token ends a
    * chunk when md5 of the trailing 3-gram starts with 0-3, p=1/4 →
    * ~4-token mean chunks), then dedupe CHUNKS across the corpus. Unlike
    * fixed-width shingles, CDC boundaries are content-anchored: inserting
    * a sentence shifts only the chunks it touches, so shared passages
    * between near-identical documents still hash to identical chunks —
    * the mechanism rsync/LLM-corpus passage dedup uses. The whole
    * operator is narrow (per-doc windows partitioned by doc_id) + one
    * hash agg on the 16-byte chunk fingerprint: the same one-shuffle
    * shape as exact dedup, at any corpus size. Output: the 20 most
    * duplicated ≥3-token chunks. */
  val dChunkCdc: Q = Q(
    "d_chunk_cdc",
    (spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      val tok = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          filter(split(col("text"), " "), t => t =!= "").as("toks"))
        .select(col("doc_id"), posexplode(col("toks")))
        .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
      val g = tok.withColumn("boundary",
        when(col("pos") >= 3 &&
          substring(md5(concat_ws(" ",
            lag(col("tok"), 2).over(w), lag(col("tok"), 1).over(w), col("tok"))), 1, 1)
            .isin("0", "1", "2", "3"), lit(1L)).otherwise(lit(0L)))
      val c = g.withColumn("chunk_id",
        coalesce(sum(col("boundary")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)) + 1)
      val chunks = c.groupBy(col("doc_id"), col("chunk_id"))
        .agg(
          md5(array_join(
            transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
              s => s.getField("tok")), " ")).as("fp"),
          count(lit(1)).as("chunk_len"))
      chunks.groupBy(col("fp"))
        .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"),
          min(col("chunk_len")).as("chunk_len"))
        .filter(col("n_occ") > 1 && col("chunk_len") >= 3)
        .orderBy(col("n_occ").desc, col("fp"))
        .limit(20)
    },
    Some("""WITH tl AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS toks FROM documents),
           |tok AS (SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos FROM tl),
           |g AS (
           |  SELECT doc_id, tok, pos,
           |    CASE WHEN pos >= 3 AND substr(md5(
           |      lag(tok,2) OVER w || ' ' || lag(tok,1) OVER w || ' ' || tok), 1, 1) IN ('0','1','2','3')
           |    THEN 1 ELSE 0 END AS boundary
           |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
           |c AS (
           |  SELECT doc_id, pos, tok,
           |    COALESCE(SUM(boundary) OVER (PARTITION BY doc_id ORDER BY pos
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS chunk_id
           |  FROM g),
           |ch AS (SELECT doc_id, chunk_id, md5(string_agg(tok, ' ' ORDER BY pos)) AS fp, COUNT(*) AS chunk_len
           |  FROM c GROUP BY 1, 2)
           |SELECT fp, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs,
           |  CAST(MIN(chunk_len) AS BIGINT) AS chunk_len
           |FROM ch GROUP BY fp HAVING COUNT(*) > 1 AND MIN(chunk_len) >= 3
           |ORDER BY n_occ DESC, fp LIMIT 20""".stripMargin))

  /** C4-style span-level exact dedup: split each document into
    * non-overlapping 8-token spans, fingerprint each span, keep only the
    * corpus-wide first occurrence (min (doc_id, span_idx) packed as
    * doc_id*2^32 + span_idx), and count every later occurrence — across
    * documents or repeated within one — as a removable duplicate. The
    * published C4 cleaning step (drop any repeated multi-sentence span
    * corpus-wide) at fixed-token granularity.
    *
    * Scale: ONE tokenize pass builds the (doc_id, n_spans, digest list)
    * grain, localCheckpoint'd because it feeds both the per-doc base and
    * the exploded digest aggregate (Catalyst inlines shared frames — the
    * tokenize would otherwise run twice). Only 32-byte digests shuffle,
    * never span text; first-owner attribution is two doc-grain frames
    * joined on doc_id. The packed first-key bounds span_idx at 2^32
    * (a 34-billion-token single document) — beyond that switch the min
    * to a struct key. */
  val dSpanDedup: Q = Q(
    "d_span_dedup",
    (spark, dir) => {
      val grain = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          expr("filter(split(text, ' '), x -> length(x) > 0)").as("toks"))
        .select(
          col("doc_id"),
          expr("cast((size(toks) + 7) div 8 as bigint)").as("n_spans"),
          expr("""CASE WHEN size(toks) = 0 THEN cast(array() as array<string>)
                 |ELSE transform(sequence(0, cast((size(toks) + 7) div 8 as int) - 1),
                 |               i -> md5(array_join(slice(toks, i*8 + 1, 8), ' ')))
                 |END""".stripMargin).as("digests"))
        .localCheckpoint()
      val spans = grain.select(col("doc_id"),
        posexplode(col("digests")).as(Seq("span_idx", "dg")))
      val firsts = spans.groupBy(col("dg"))
        .agg(min(col("doc_id") * lit(4294967296L) + col("span_idx")).as("fk"))
      val owners = firsts.select(expr("fk div 4294967296").as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_firsts"))
      grain.select(col("doc_id"), col("n_spans"))
        .join(owners, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_spans"),
          (col("n_spans") - coalesce(col("n_firsts"), lit(0L))).as("n_dup_spans"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id,
           |  list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks FROM documents),
           |base AS (SELECT doc_id, (len(toks) + 7) // 8 AS n_spans FROM d),
           |spans0 AS (SELECT doc_id,
           |  unnest([{'span_idx': i, 'dg': md5(array_to_string(toks[i*8+1 : i*8+8], ' '))}
           |          FOR i IN range((len(toks) + 7) // 8)]) AS u FROM d),
           |spans AS (SELECT doc_id, u.span_idx AS span_idx, u.dg AS dg FROM spans0),
           |firsts AS (SELECT dg, MIN(doc_id*4294967296 + span_idx) AS fk FROM spans GROUP BY dg),
           |owners AS (SELECT fk // 4294967296 AS doc_id, COUNT(*) AS n_firsts FROM firsts GROUP BY 1)
           |SELECT b.doc_id, CAST(b.n_spans AS BIGINT) AS n_spans,
           |  CAST(b.n_spans - COALESCE(o.n_firsts, 0) AS BIGINT) AS n_dup_spans
           |FROM base b LEFT JOIN owners o USING (doc_id) ORDER BY doc_id""".stripMargin))

  val all: Seq[Q] = Seq(dExact, dTokenDedup, dNgramJaccard, dMinhashLsh, dSimhash, dLshBuckets,
    dChunkCdc, dSpanDedup)
}
