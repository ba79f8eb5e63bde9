package graft.engine

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

/** The litebase 5-type dynamic value model and wire formats.
  *
  * Type tags are SQLite storage classes (reference
  * pkg/sqlite3/column.go:34-41; constants pkg/sqlite3/constants.go:49-53):
  * INTEGER=1, FLOAT=2, TEXT=3, BLOB=4, NULL=5.
  */
object ColumnType {
  val Unknown = 0; val Integer = 1; val Float = 2; val Text = 3
  val Blob = 4; val Null = 5
}

/** A dynamically-typed SQL value (per-value typing, like SQLite). */
sealed trait SqlValue {
  def typeTag: Int
  def typeName: String
}
object SqlValue {
  case class IntVal(v: Long) extends SqlValue {
    val typeTag = ColumnType.Integer; val typeName = "INTEGER"
  }
  case class RealVal(v: Double) extends SqlValue {
    val typeTag = ColumnType.Float; val typeName = "FLOAT"
  }
  case class TextVal(v: String) extends SqlValue {
    val typeTag = ColumnType.Text; val typeName = "TEXT"
  }
  case class BlobVal(v: Array[Byte]) extends SqlValue {
    val typeTag = ColumnType.Blob; val typeName = "BLOB"
  }
  case object NullVal extends SqlValue {
    val typeTag = ColumnType.Null; val typeName = "NULL"
  }

  /** Map a Spark-side JVM value into the 5-type model (the "dynamic typing
    * shim" of SURVEY §7.3: per-value tags at the encode boundary). */
  def fromAny(v: Any): SqlValue = v match {
    case null => NullVal
    case x: Long => IntVal(x)
    case x: Int => IntVal(x.toLong)
    case x: Short => IntVal(x.toLong)
    case x: Byte => IntVal(x.toLong)
    case x: Boolean => IntVal(if (x) 1L else 0L)
    case x: Double => RealVal(x)
    case x: Float => RealVal(x.toDouble)
    case x: java.math.BigDecimal => RealVal(x.doubleValue)
    case x: BigDecimal => RealVal(x.doubleValue)
    case x: String => TextVal(x)
    case x: Array[Byte] => BlobVal(x)
    case x: java.sql.Timestamp => TextVal(x.toString)
    case x: java.time.LocalDateTime => TextVal(x.toString.replace('T', ' '))
    case x: java.sql.Date => TextVal(x.toString)
    case x: java.time.LocalDate => TextVal(x.toString)
    case other => TextVal(other.toString)
  }

  /** JSON value encoding (reference pkg/sqlite3/column.go:224-253: ints and
    * floats as numbers, text/blob as strings, null as null). */
  def toJson(v: SqlValue, sb: StringBuilder): Unit = v match {
    case IntVal(x) => sb.append(x)
    case RealVal(x) =>
      if (x.isNaN || x.isInfinite) sb.append("null") else sb.append(x)
    case TextVal(x) => Json.string(x, sb)
    case BlobVal(x) => Json.string(new String(x, UTF_8), sb)
    case NullVal => sb.append("null")
  }
}

/** A typed query parameter (reference pkg/sqlite3/parameter.go:12-36,
  * validated oneof TEXT INTEGER FLOAT BLOB NULL). */
case class Param(typeName: String, value: SqlValue)
object Param {
  def integer(v: Long): Param = Param("INTEGER", SqlValue.IntVal(v))
  def float(v: Double): Param = Param("FLOAT", SqlValue.RealVal(v))
  def text(v: String): Param = Param("TEXT", SqlValue.TextVal(v))
  def blob(v: Array[Byte]): Param = Param("BLOB", SqlValue.BlobVal(v))
  val nul: Param = Param("NULL", SqlValue.NullVal)
}

/** One query in a request (reference pkg/database/query_input.go:27-32). */
case class QueryInput(id: String, statement: String,
    parameters: Seq[Param] = Nil, transactionId: String = "")

/** One query's result (reference pkg/database/query_response.go). */
case class QueryResponse(
    id: String,
    columns: Seq[String],
    rows: Seq[Seq[SqlValue]],
    changes: Long = 0L,
    lastInsertRowId: Long = 0L,
    latency: Double = 0.0,
    transactionId: String = "",
    error: String = "")

/** Minimal JSON writer (no deps; mirrors encoding/json's escaping for the
  * subset we emit). */
object Json {
  def string(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}

/** Binary wire codecs — little-endian, layouts ported byte-for-byte from
  * the reference (QueryInput: pkg/database/query_input.go:13-26 doc block +
  * Decode :48-90; parameters: pkg/sqlite3/parameter.go:108-146; response:
  * pkg/database/query_response.go:112-282; column framing:
  * pkg/sqlite3/column.go:14-23,61-198).
  */
object Wire {
  private def bb(bytes: Array[Byte]) =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  // -- QueryInput ----------------------------------------------------------

  def encodeInput(q: QueryInput): Array[Byte] = {
    val id = q.id.getBytes(UTF_8)
    val txn = q.transactionId.getBytes(UTF_8)
    val stmt = q.statement.getBytes(UTF_8)
    val params = encodeParams(q.parameters)
    val buf = ByteBuffer.allocate(16 + id.length + txn.length + stmt.length + params.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(id.length); buf.put(id)
    buf.putInt(txn.length); buf.put(txn)
    buf.putInt(stmt.length); buf.put(stmt)
    buf.putInt(params.length); buf.put(params)
    buf.array()
  }

  def decodeInput(bytes: Array[Byte]): QueryInput = {
    val buf = bb(bytes)
    def str(n: Int): String = {
      val a = new Array[Byte](n); buf.get(a); new String(a, UTF_8)
    }
    val id = str(buf.getInt())
    val txn = str(buf.getInt())
    val stmt = str(buf.getInt())
    val paramsLen = buf.getInt()
    val end = buf.position() + paramsLen
    val params = scala.collection.mutable.ArrayBuffer[Param]()
    while (buf.position() < end) params += decodeParam(buf)
    QueryInput(id, stmt, params.toSeq, txn)
  }

  private def encodeParams(ps: Seq[Param]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    ps.foreach { p =>
      val body: Array[Byte] = p.value match {
        case SqlValue.IntVal(v) =>
          ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()
        case SqlValue.RealVal(v) =>
          ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array()
        case SqlValue.TextVal(v) => v.getBytes(UTF_8)
        case SqlValue.BlobVal(v) => v
        case SqlValue.NullVal => Array.emptyByteArray
      }
      out.write(p.value.typeTag)
      out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(body.length).array(), 0, 4)
      out.write(body, 0, body.length)
    }
    out.toByteArray
  }

  private def decodeParam(buf: ByteBuffer): Param = {
    val tag = buf.get() & 0xFF
    val len = buf.getInt()
    tag match {
      case ColumnType.Integer => Param.integer(buf.getLong())
      case ColumnType.Float => Param.float(buf.getDouble())
      case ColumnType.Text =>
        val a = new Array[Byte](len); buf.get(a); Param.text(new String(a, UTF_8))
      case ColumnType.Blob =>
        val a = new Array[Byte](len); buf.get(a); Param.blob(a)
      case ColumnType.Null => Param.nul
      case _ =>
        val a = new Array[Byte](len); buf.get(a); Param.blob(a)
    }
  }

  // -- Column value framing: 1-byte tag + 4-byte length + payload ----------

  private def encodeColumn(v: SqlValue, out: java.io.ByteArrayOutputStream): Unit = {
    val body: Array[Byte] = v match {
      case SqlValue.IntVal(x) =>
        ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(x).array()
      case SqlValue.RealVal(x) =>
        ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(x).array()
      case SqlValue.TextVal(x) => x.getBytes(UTF_8)
      case SqlValue.BlobVal(x) => x
      case SqlValue.NullVal => Array.emptyByteArray
    }
    out.write(v.typeTag)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(body.length).array(), 0, 4)
    out.write(body, 0, body.length)
  }

  private def decodeColumn(buf: ByteBuffer): SqlValue = {
    val tag = buf.get() & 0xFF
    val len = buf.getInt()
    tag match {
      case ColumnType.Integer => SqlValue.IntVal(buf.getLong())
      case ColumnType.Float => SqlValue.RealVal(buf.getDouble())
      case ColumnType.Text =>
        val a = new Array[Byte](len); buf.get(a); SqlValue.TextVal(new String(a, UTF_8))
      case ColumnType.Blob =>
        val a = new Array[Byte](len); buf.get(a); SqlValue.BlobVal(a)
      case _ => SqlValue.NullVal
    }
  }

  // -- QueryResponse -------------------------------------------------------

  /** Version byte 1; id/txn length-prefixed; then either error or
    * changes(u32) latency(f64) columnCount(u32) rowCount(u32)
    * lastInsertRowId(u32) columnsDataLen(u32) columns rows. */
  def encodeResponse(r: QueryResponse): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = out.write(
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array(), 0, 4)
    def f64(v: Double): Unit = out.write(
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array(), 0, 8)
    def bytes(b: Array[Byte]): Unit = out.write(b, 0, b.length)

    out.write(1) // version
    val id = r.id.getBytes(UTF_8); u32(id.length); bytes(id)
    val txn = r.transactionId.getBytes(UTF_8); u32(txn.length); bytes(txn)
    if (r.error.nonEmpty) {
      val e = r.error.getBytes(UTF_8); u32(e.length); bytes(e)
    } else {
      u32(r.changes.toInt)
      f64(r.latency)
      u32(r.columns.length)
      u32(r.rows.length)
      u32(r.lastInsertRowId.toInt)
      val colBytes = r.columns.map(_.getBytes(UTF_8))
      u32(colBytes.map(4 + _.length).sum)
      colBytes.foreach { c => u32(c.length); bytes(c) }
      r.rows.foreach { row =>
        val rowOut = new java.io.ByteArrayOutputStream()
        row.foreach(encodeColumn(_, rowOut))
        val rb = rowOut.toByteArray
        u32(rb.length); bytes(rb)
      }
    }
    out.toByteArray
  }

  def decodeResponse(bytesIn: Array[Byte]): QueryResponse = {
    val buf = bb(bytesIn)
    require(buf.get() == 1, "unsupported response version")
    def str(n: Int): String = {
      val a = new Array[Byte](n); buf.get(a); new String(a, UTF_8)
    }
    val id = str(buf.getInt())
    val txn = str(buf.getInt())
    val changes = buf.getInt().toLong
    val latency = buf.getDouble()
    val columnCount = buf.getInt()
    val rowCount = buf.getInt()
    val lastInsert = buf.getInt().toLong
    buf.getInt() // columns data length
    val columns = (0 until columnCount).map(_ => str(buf.getInt()))
    val rows = (0 until rowCount).map { _ =>
      buf.getInt() // row length
      (0 until columnCount).map(_ => decodeColumn(buf))
    }
    QueryResponse(id, columns, rows, changes, lastInsert, latency, txn)
  }

  /** JSON shape of a response (reference query_response.go:307-342 +
    * controller wrapper :290-293 {status, data}). */
  def responseJson(r: QueryResponse): String = {
    val sb = new StringBuilder(256)
    sb.append("{\"changes\":").append(r.changes)
    sb.append(",\"columns\":[")
    r.columns.zipWithIndex.foreach { case (c, i) =>
      if (i > 0) sb.append(','); Json.string(c, sb)
    }
    sb.append("],\"id\":"); Json.string(r.id, sb)
    sb.append(",\"latency\":").append(r.latency)
    sb.append(",\"last_insert_row_id\":").append(r.lastInsertRowId)
    sb.append(",\"row_count\":").append(r.rows.length)
    sb.append(",\"rows\":[")
    r.rows.zipWithIndex.foreach { case (row, i) =>
      if (i > 0) sb.append(',')
      sb.append('[')
      row.zipWithIndex.foreach { case (v, j) =>
        if (j > 0) sb.append(','); SqlValue.toJson(v, sb)
      }
      sb.append(']')
    }
    sb.append("],\"transaction_id\":"); Json.string(r.transactionId, sb)
    sb.append('}')
    sb.toString
  }
}
