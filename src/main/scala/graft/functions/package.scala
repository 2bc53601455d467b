package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.Shims

/** Column wrappers for graft's native Catalyst expressions. */
package object functions {
  private[graft] def column(e: Expression): Column = Shims.column(e)

  /** payload binary -> float32[width] in [0,1] (pad/truncate + /255). */
  def packet_vector(payload: Column, width: Int): Column =
    column(PacketVector(Shims.expression(payload), width))

  /** Fused integer dot product over two ARRAY<BIGINT> columns (equal
    * dimensions) — allocation-free codegen loop. */
  def vec_dot_long(a: Column, b: Column): Column =
    column(LongVecDot(Shims.expression(a), Shims.expression(b)))

  /** Distinct k-gram polynomial hashes of a text in one pass (exact
    * value parity with TextHash.polyHash over TextHash.shingles; hash-
    * space dedup — min-aggregation consumers only). */
  def shingle_hashes(text: Column, k: Int): Column =
    column(ShingleHashes(Shims.expression(text), k))

  /** Fused float dot product over two ARRAY<FLOAT> columns (double
    * accumulator, fixed order) — unquantized ANN scoring. */
  def vec_dot_float(a: Column, b: Column): Column =
    column(FloatVecDot(Shims.expression(a), Shims.expression(b)))

  /** Unicode NFC + control-strip + whitespace collapse + trim, fused into
    * one codegen'd pass (corpus canonicalization hot path). */
  def normalize_text(text: Column): Column =
    column(NormalizeText(Shims.expression(text)))

  /** Word n-gram shingle GENERATOR (UDTF): one output row per shingle,
    * streamed — no per-document shingle array is materialized. Use in a
    * select like explode: `df.select(word_shingles(col("text"), 3))`. */
  def word_shingles(text: Column, n: Int): Column =
    column(WordShingles(Shims.expression(text), n))

  /** Native Bloom-filter membership probe (BloomFilterMightContain — the
    * codegen'd expression behind Spark's runtime row-level bloom join
    * filters; not exposed in the public function registry, hence this
    * wrapper). `bloom` is the util.sketch.BloomFilter serialized via
    * writeTo — the same wire format BloomFilterImpl.readFrom expects. */
  def might_contain(bloom: Array[Byte], key: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(bloom),
      Shims.expression(key)))
}
