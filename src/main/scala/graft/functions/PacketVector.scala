package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** Native Catalyst expression for the reference's pad/truncate/normalize
  * stage (/root/reference/BytesProcessor.py:270-286 and :284): binary
  * payload -> fixed-width float32 array in [0,1], value (b & 0xFF)/255f.
  *
  * Why an Expression and not a UDF/typed map: with doGenCode the loop
  * stays inside whole-stage codegen — no ser/deser boundary, no boxing —
  * and the output is an UnsafeArrayData written straight into the row
  * buffer. At 100 TB this is the hottest loop in the flagship pipeline
  * (1525 floats per packet), so it must be a tight primitive loop.
  *
  * Sign fix is load-bearing: numpy reads payload bytes as uint8
  * (BytesProcessor.py:173) while JVM bytes are signed — hence `& 0xFF`
  * (SURVEY.md §7.5). Padding with zeros matches np.zeros pre-allocation
  * (:277-281).
  */
final case class PacketVector(child: Expression, width: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY child, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "packet_vector"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val out = new Array[Float](width)
    val n = math.min(width, bytes.length)
    var i = 0
    while (i < n) { out(i) = (bytes(i) & 0xff) / 255.0f; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |float[] $arr = new float[$width];
         |int $n = java.lang.Math.min($width, $c.length);
         |for (int $i = 0; $i < $n; $i++) {
         |  $arr[$i] = ($c[$i] & 0xFF) / 255.0f;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PacketVector =
    copy(child = newChild)
}
