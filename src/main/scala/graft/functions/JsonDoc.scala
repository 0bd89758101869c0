package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass NDJSON serializer for a flat struct — replaces `to_json`
  * on the routed document (the last hot spot of the pipeline: Jackson's
  * generator allocates heavily per row). Emits the same logical JSON:
  * null fields dropped (absent-key semantics), strings escaped per the
  * JSON spec, timestamps in Spark's default `yyyy-MM-dd'T'HH:mm:ss.SSSXXX`
  * UTC form. Field order is schema order (key order is irrelevant to all
  * consumers and tests — they parse).
  */
object JsonDoc {

  def jsonDoc(struct: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(JsonDocExpr(GraftBridge.expression(struct)))
  }
}

case class JsonDocExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_doc"

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val names: Array[String] = structType.fields.map(_.name)
  private lazy val types: Array[DataType] = structType.fields.map(_.dataType)

  @transient private lazy val tsFmt =
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .withZone(java.time.ZoneOffset.UTC)

  @transient private lazy val ntzFmt =
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS")

  private def escapeTo(sb: java.lang.StringBuilder, s: String): Unit = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case x if x < ' ' => sb.append(f"\\u${x.toInt}%04x")
        case x => sb.append(x)
      }
      i += 1
    }
  }

  /** Instance entry point used from both eval and generated code. */
  def evalDoc(row: InternalRow): UTF8String = {
    if (row == null) return null
    val sb = new java.lang.StringBuilder(256)
    sb.append('{')
    var first = true
    var i = 0
    while (i < names.length) {
      if (!row.isNullAt(i)) {
        if (!first) sb.append(',')
        first = false
        sb.append('"'); sb.append(names(i)); sb.append("\":")
        types(i) match {
          case StringType =>
            sb.append('"'); escapeTo(sb, row.getUTF8String(i).toString); sb.append('"')
          case LongType    => sb.append(row.getLong(i))
          case IntegerType => sb.append(row.getInt(i))
          case BooleanType => sb.append(row.getBoolean(i))
          case DoubleType  => sb.append(row.getDouble(i))
          case TimestampType =>
            val us = row.getLong(i)
            val inst = java.time.Instant.ofEpochSecond(
              Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
            sb.append('"'); sb.append(tsFmt.format(inst)); sb.append('"')
          case TimestampNTZType => // to_json formats NTZ without a zone
            val us = row.getLong(i)
            val ldt = java.time.LocalDateTime.ofEpochSecond(
              Math.floorDiv(us, 1000000L),
              (Math.floorMod(us, 1000000L) * 1000L).toInt,
              java.time.ZoneOffset.UTC)
            sb.append('"'); sb.append(ntzFmt.format(ldt)); sb.append('"')
          case other =>
            throw new IllegalArgumentException(s"json_doc: unsupported type $other")
        }
      }
      i += 1
    }
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any =
    evalDoc(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonDocExpr", this, classOf[JsonDocExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalDoc($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): JsonDocExpr =
    copy(child = newChild)
}
