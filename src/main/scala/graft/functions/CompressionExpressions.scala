package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Gzip compression/decompression as native codegen'd expressions — the
  * ingest seam for corpora stored as compressed text (WET/WARC-style
  * dumps ship one gzip member per record): decompress at scan time, per
  * row, zero shuffle, no UDF, inside whole-stage codegen like the JSON
  * and string packs. */
object CompressionExpressions {

  /** string → gzip bytes (java.util.zip, default deflate level; the
    * header's MTIME is written as 0 so output is deterministic). */
  case class GzipCompress(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "gzip"

    override protected def nullSafeEval(x: Any): Any =
      CompressionOps.gzip(x.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"graft.functions.CompressionOps.gzip($x)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** gzip bytes → string (UTF-8). Throws on corrupt input — ingest
    * pipelines should quarantine, not silently null, truncated members. */
  case class GzipDecompress(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "gunzip"

    override protected def nullSafeEval(x: Any): Any =
      CompressionOps.gunzip(x.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"graft.functions.CompressionOps.gunzip($x)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}

/** Static kernels called from generated code. */
object CompressionOps {
  def gzip(s: UTF8String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(s.getBytes)
    gz.close()
    bos.toByteArray
  }

  def gunzip(b: Array[Byte]): UTF8String = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
    try UTF8String.fromBytes(in.readAllBytes()) finally in.close()
  }
}
