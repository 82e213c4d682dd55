package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MsgPosition wire-format codec (see
  * [[graft.cdc.Cdc.positionCodecFrom]] for the format: protobuf field 1
  * length-prefixed name, field 2 8-byte big-endian msgID, field 4 a fixed
  * 9-byte varint TSO — every TSO in [2⁵⁶, 2⁶³) encodes to exactly 9
  * varint bytes, asserted in spec).
  *
  * Replaces a ~200-node hex-string Column formulation (9 lpad∘hex terms to
  * build the varint, 9 conv∘substr terms to fold it back, dynamic-offset
  * substrings for the name/id slices) whose per-invocation ANALYSIS cost
  * dominated the op at metadata row counts — the bench re-builds the frame
  * each pass, and resolving/optimizing that tree cost ~0.3-0.5 s of pure
  * driver time before a single row moved (ProbePlanCost). One encode and
  * one decode expression keep the tree a handful of nodes, and execution
  * becomes two primitive byte loops instead of hex-string round-trips.
  *
  * Byte-for-byte identical to the column formulation on its domain:
  * single-byte name lengths (names here are ≤ 25 ASCII chars), any long
  * msgID (two's-complement BE, exactly `lpad(hex(id), 16, '0')`), TSO
  * shifts arithmetic like Spark's `shiftright` (TSOs are positive by
  * range). Decode mirrors the column version's strict slicing — no tag
  * validation — and returns a null struct for a blob too short to slice,
  * where the column version yielded per-field nulls (neither occurs for
  * wire-encoded input, which is the only input both receive).
  */
case class PositionWireEncode(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"PositionWireEncode needs (string name, long id, long tso), got $t")
    }

  override def nullSafeEval(name: Any, id: Any, tso: Any): Any =
    PositionWireCodec.encode(name.asInstanceOf[UTF8String],
      id.asInstanceOf[Long], tso.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (n, i, t) =>
      s"${ev.value} = graft.functions.PositionWireCodec.encode($n, $i, $t);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Decode side of [[PositionWireEncode]]: blob → (channel_name, event_id,
  * tso) struct, slicing exactly where the wire layout puts each field.
  */
case class PositionWireDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PositionWireCodec.decodedType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"PositionWireDecode needs a binary blob, got $t")
  }

  override def nullSafeEval(blob: Any): Any =
    PositionWireCodec.decode(blob.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.functions.PositionWireCodec.decode($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Compiled kernel shared by interpreted eval and codegen. */
object PositionWireCodec {

  val decodedType: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("event_id", LongType),
    StructField("tso", LongType)))

  /** 0A | len | name-bytes | 12 08 | 8-byte BE id | 20 | 9-byte varint.
    * len is the name's CHAR count (equal to its byte count on the ASCII
    * domain), matching the column version's `hex(length(name))`.
    */
  def encode(name: UTF8String, id: Long, tso: Long): Array[Byte] = {
    val nb = name.getBytes
    val out = new Array[Byte](2 + nb.length + 10 + 10)
    out(0) = 0x0A
    out(1) = name.numChars().toByte
    System.arraycopy(nb, 0, out, 2, nb.length)
    var o = 2 + nb.length
    out(o) = 0x12; out(o + 1) = 0x08
    o += 2
    var i = 0
    while (i < 8) {
      out(o + i) = ((id >>> (8 * (7 - i))) & 0xFF).toByte
      i += 1
    }
    o += 8
    out(o) = 0x20
    o += 1
    var j = 0
    while (j < 8) {
      out(o + j) = (((tso >> (7 * j)) & 0x7F) | 0x80).toByte
      j += 1
    }
    out(o + 8) = ((tso >> 56) & 0x7F).toByte
    out
  }

  /** Null for a blob too short to slice (cannot happen for wire-encoded
    * input); otherwise the exact inverse slicing of the column decode:
    * every varint byte contributes its low 7 bits, shifted 7·j.
    */
  def decode(blob: Array[Byte]): InternalRow = {
    if (blob.length < 2) return null
    val nameLen = blob(1) & 0xFF
    val idOff = 2 + nameLen + 2
    val tsoOff = idOff + 8 + 1
    if (blob.length < tsoOff + 9) return null
    val name = UTF8String.fromBytes(blob, 2, nameLen)
    var id = 0L
    var i = 0
    while (i < 8) { id = (id << 8) | (blob(idOff + i) & 0xFFL); i += 1 }
    var tso = 0L
    var j = 0
    while (j < 9) { tso += (blob(tsoOff + j) & 0x7FL) << (7 * j); j += 1 }
    new GenericInternalRow(Array[Any](name, id, tso))
  }
}
