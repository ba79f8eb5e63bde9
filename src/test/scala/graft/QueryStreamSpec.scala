package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.engine._

/** B8 stream protocol: full client->server->client round trip against a
  * live engine, plus per-entry error framing. */
class QueryStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def engine(): GraftSession = {
    val s = new GraftSession(spark, Files.createTempDirectory("graft-stream"))
    s.createDatabase("db")
    s
  }

  private def runConversation(e: GraftSession, messages: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    QueryStream.serve(new ByteArrayInputStream(messages), out,
      q => e.execute("db", "main", q))
    out.toByteArray
  }

  test("open -> frame with queries -> close round trip") {
    val e = engine()
    e.execute("db", "main", QueryInput("s", "CREATE TABLE t (id INTEGER, v TEXT)"))
    val msgs = new ByteArrayOutputStream()
    QueryStream.writeMessage(msgs, QueryStream.Open, Array.emptyByteArray)
    QueryStream.writeMessage(msgs, QueryStream.Frame, QueryStream.encodeFrame(Seq(
      QueryInput("q1", "INSERT INTO t VALUES (?, ?)",
        Seq(Param.integer(1), Param.text("x"))),
      QueryInput("q2", "SELECT id, v FROM t"))))
    QueryStream.writeMessage(msgs, QueryStream.Close, Array.emptyByteArray)

    val replyBytes = runConversation(e, msgs.toByteArray)
    // reply: open-ack then one frame
    val in = new ByteArrayInputStream(replyBytes)
    val ackHeader = in.readNBytes(5)
    assert((ackHeader(0) & 0xFF) == QueryStream.Open)
    val frameHeader = in.readNBytes(5)
    assert((frameHeader(0) & 0xFF) == QueryStream.Frame)
    val frameLen = java.nio.ByteBuffer.wrap(frameHeader, 1, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val entries = QueryStream.decodeResponseFrame(in.readNBytes(frameLen))
    assert(entries.length == 2)
    assert(entries.forall(!_._1)) // no errors
    val r1 = Wire.decodeResponse(entries(0)._2)
    assert(r1.id == "q1" && r1.changes == 1)
    val r2 = Wire.decodeResponse(entries(1)._2)
    assert(r2.id == "q2" && r2.rows ==
      Seq(Seq(SqlValue.IntVal(1), SqlValue.TextVal("x"))))
  }

  test("per-entry errors use the 0x03 tag without killing the frame") {
    val e = engine()
    e.execute("db", "main", QueryInput("s", "CREATE TABLE t (id INTEGER)"))
    val msgs = new ByteArrayOutputStream()
    QueryStream.writeMessage(msgs, QueryStream.Frame, QueryStream.encodeFrame(Seq(
      QueryInput("bad", "SELECT * FROM nope"),
      QueryInput("good", "SELECT count(*) AS n FROM t"))))
    QueryStream.writeMessage(msgs, QueryStream.Close, Array.emptyByteArray)

    val in = new ByteArrayInputStream(runConversation(e, msgs.toByteArray))
    val frameHeader = in.readNBytes(5)
    val frameLen = java.nio.ByteBuffer.wrap(frameHeader, 1, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val entries = QueryStream.decodeResponseFrame(in.readNBytes(frameLen))
    assert(entries.length == 2)
    assert(entries(0)._1, "first entry should be an error")
    assert(!entries(1)._1)
    assert(Wire.decodeResponse(entries(1)._2).rows.head.head == SqlValue.IntVal(0))
  }
}
