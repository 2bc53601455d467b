package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine-expressible text hashing used by the dedup
  * family. Spark's builtin `hash`/`xxhash64` have no DuckDB twin, so the
  * oracle-checked near-dup operators use an explicit polynomial hash over
  * character codes — same arithmetic on both engines, exact in Long space.
  *
  * Spark column builders and the equivalent SQL-text builders live side by
  * side so query + oracle can never drift apart.
  */
object TextHash {
  val ShingleLen = 6
  /** 2^31-1, keeps products inside Long. */
  val HashMod = 2147483647L
  /** MinHash universe prime. */
  val MinHashP = 1000003L
  val NumHashes = 12
  val Bands = 6 // 6 bands x 2 rows
  val RowsPerBand: Int = NumHashes / Bands
  def hashA(j: Int): Long = 101L * j + 37L
  def hashB(j: Int): Long = 613L * j + 17L

  /** Distinct character shingles of length `k` (positions 1..len-k+1). */
  def shingles(text: Column, k: Int): Column =
    when(length(text) >= k,
      array_distinct(transform(
        sequence(lit(1), length(text) - (k - 1)),
        i => text.substr(i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** Polynomial hash of a fixed-length-k string: sum ascii(c_i)*31^(k-i) mod 2^31-1. */
  def polyHash(s: Column, k: Int): Column = {
    val acc = (1 to k).foldLeft(lit(0L)) { (acc, i) =>
      acc * 31L + ascii(s.substr(lit(i), lit(1))).cast("long")
    }
    acc % HashMod
  }

  /** Same polynomial hash as SQL text (DuckDB dialect). */
  def polyHashSql(expr: String, k: Int): String = {
    val acc = (1 to k).foldLeft("CAST(0 AS BIGINT)") { (acc, i) =>
      s"(($acc) * 31 + ascii(substring($expr, $i, 1)))"
    }
    s"(($acc) % $HashMod)"
  }

  /** Shingle-set SQL: DISTINCT unnest of all k-char substrings. */
  def shinglesSqlFrom(k: Int): String =
    s"unnest(list_transform(range(1, length(text) - ${k - 2}), i -> substring(text, CAST(i AS INT), $k)))"

  /** MinHash j-th hash of a base hash column. */
  def minHashOf(h0: Column, j: Int): Column =
    (h0 * hashA(j) + hashB(j)) % MinHashP
  def minHashOfSql(expr: String, j: Int): String =
    s"(($expr) * ${hashA(j)} + ${hashB(j)}) % $MinHashP"
}
