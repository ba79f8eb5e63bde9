package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine._

/** Binary + JSON wire-format round trips (reference layouts:
  * pkg/database/query_input.go, query_response.go, pkg/sqlite3/column.go). */
class WireSpec extends AnyFunSuite {

  test("QueryInput binary round trip with all 5 parameter types") {
    val in = QueryInput("q1", "SELECT * FROM t WHERE a = ? AND b = ?",
      Seq(Param.integer(-7), Param.float(3.25), Param.text("héllo"),
        Param.blob(Array[Byte](0, 1, -2)), Param.nul),
      "txn-123")
    val decoded = Wire.decodeInput(Wire.encodeInput(in))
    assert(decoded.id == in.id)
    assert(decoded.statement == in.statement)
    assert(decoded.transactionId == in.transactionId)
    assert(decoded.parameters.length == 5)
    assert(decoded.parameters(0) == Param.integer(-7))
    assert(decoded.parameters(1) == Param.float(3.25))
    assert(decoded.parameters(2) == Param.text("héllo"))
    assert(decoded.parameters(3).value.asInstanceOf[SqlValue.BlobVal].v.toSeq ==
      Seq[Byte](0, 1, -2))
    assert(decoded.parameters(4) == Param.nul)
  }

  test("QueryInput layout: little-endian length-prefixed fields in order") {
    val in = QueryInput("ab", "SELECT 1", Nil, "")
    val b = Wire.encodeInput(in)
    // id length (2) LE, 'ab', txn length 0, stmt length 8, 'SELECT 1', params 0
    assert(b(0) == 2 && b(1) == 0 && b(2) == 0 && b(3) == 0)
    assert(new String(b.slice(4, 6)) == "ab")
    assert(b.slice(6, 10).toSeq == Seq[Byte](0, 0, 0, 0))
    assert(b(10) == 8)
    assert(new String(b.slice(14, 22)) == "SELECT 1")
  }

  test("QueryResponse binary round trip incl. typed rows") {
    val r = QueryResponse("q9",
      Seq("i", "f", "t", "b", "n"),
      Seq(Seq(SqlValue.IntVal(1), SqlValue.RealVal(0.5), SqlValue.TextVal("x"),
        SqlValue.BlobVal(Array[Byte](9)), SqlValue.NullVal)),
      changes = 3, lastInsertRowId = 17, latency = 0.125, transactionId = "t1")
    val d = Wire.decodeResponse(Wire.encodeResponse(r))
    assert(d.id == "q9" && d.transactionId == "t1")
    assert(d.changes == 3 && d.lastInsertRowId == 17 && d.latency == 0.125)
    assert(d.columns == r.columns)
    assert(d.rows.head(0) == SqlValue.IntVal(1))
    assert(d.rows.head(1) == SqlValue.RealVal(0.5))
    assert(d.rows.head(2) == SqlValue.TextVal("x"))
    assert(d.rows.head(3).asInstanceOf[SqlValue.BlobVal].v.toSeq == Seq[Byte](9))
    assert(d.rows.head(4) == SqlValue.NullVal)
  }

  test("column framing: 1-byte type tag + u32 length (SQLite storage classes)") {
    val r = QueryResponse("a", Seq("c"), Seq(Seq(SqlValue.IntVal(5))))
    val b = Wire.encodeResponse(r)
    // tail: rowLen(4) | tag(1)=1 | len(4)=8 | value(8)
    val row = b.takeRight(17)
    assert(row(0) == 13) // row byte length
    assert(row(4) == ColumnType.Integer)
    assert(row(5) == 8)
    assert(row(9) == 5) // little-endian long 5
  }

  test("JSON response shape matches reference field names") {
    val r = QueryResponse("q1", Seq("n"), Seq(Seq(SqlValue.IntVal(1))),
      changes = 0, latency = 0.5)
    val js = Wire.responseJson(r)
    assert(js.contains("\"changes\":0"))
    assert(js.contains("\"columns\":[\"n\"]"))
    assert(js.contains("\"row_count\":1"))
    assert(js.contains("\"last_insert_row_id\":0"))
    assert(js.contains("\"rows\":[[1]]"))
    assert(js.contains("\"transaction_id\":\"\""))
  }

  test("param substitution skips string literals and escapes text") {
    val out = Sql.substituteParams(
      "SELECT '?' AS lit, a FROM t WHERE b = ? AND c = ?",
      Seq(Param.text("it's"), Param.integer(2)))
    assert(out == "SELECT '?' AS lit, a FROM t WHERE b = 'it''s' AND c = 2")
  }
}
