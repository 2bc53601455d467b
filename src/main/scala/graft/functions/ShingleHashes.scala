package graft.functions

import graft.ops.TextHash
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All k-gram polynomial hashes of a text in ONE pass: replaces the
  * composable `explode(array_distinct(transform(sequence(...), substr)))`
  * + fold-of-ascii chain used by the MinHash queries, which materializes
  * every shingle as a string and re-walks it character by character
  * (O(k) substrings + O(k) ascii() calls per window).
  *
  * Value parity with [[TextHash.polyHash]] over [[TextHash.shingles]] is
  * exact: same fold (acc*31 + codepoint, mod 2^31-1 at the end) over the
  * same windows. Dedup here is by HASH, not by shingle string — downstream
  * is always `min` aggregation over the multiset, for which hash-space
  * collapse is indistinguishable. (Do NOT reuse for set-cardinality
  * semantics like Jaccard counts.)
  */
final case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING child, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** Shared by interpreted eval and codegen. */
  def compute(text: UTF8String, k: Int): UnsafeArrayData = {
    val s = text.toString
    val n = s.length
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]((n - k + 1) * 2)
    var i = 0
    while (i + k <= n) {
      var h = 0L
      var j = 0
      while (j < k) { h = h * 31L + s.charAt(i + j).toLong; j += 1 }
      seen.add(h % TextHash.HashMod)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
