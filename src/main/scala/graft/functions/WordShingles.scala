package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst Generator (UDTF surface): emits one row per word
  * n-gram shingle of the input text, streamed directly from the token
  * walk — the array-free alternative to `explode(transform(split(...)))`,
  * which materializes every shingle string into one array value per row
  * before the explode (for a 10k-token document at n=3 that's a ~10k-
  * element array held live per input row). A Generator hands rows to
  * `GenerateExec` one at a time, so peak memory per row is one shingle.
  *
  * Null/short inputs generate zero rows (outer-generate semantics are the
  * caller's choice via generatorOuter, same as explode).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val toks = v.asInstanceOf[UTF8String].toString
        .split(' ').iterator.filter(_.nonEmpty).toArray
      if (toks.length < n) Nil
      else (0 to toks.length - n).iterator.map { i =>
        InternalRow(UTF8String.fromString(toks.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
