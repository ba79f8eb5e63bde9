package graft.engine

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** HMAC request authentication, wire-compatible with the reference.
  *
  * Signing chain (pkg/auth/request_signer.go:16-104; validated by
  * pkg/http/request_signature_validator.go):
  *   bodyHash   = hex(sha256(body))
  *   reqString  = METHOD + /path + json(signedHeaders) + json(queryParams|{}) + bodyHash
  *   signedReq  = hex(sha256(reqString))
  *   date       = hex(hmacSha256(secret, headers["x-lbdb-date"]))
  *   service    = hex(hmacSha256(date, "litebase_request"))
  *   signature  = hex(hmacSha256(service, signedReq))
  *   token      = base64("credential=<id>;signed_headers=content-type,host,x-lbdb-date;signature=<sig>")
  * Signed headers are lowercased with `_`->`-` (TransformHeaderKey) and
  * filtered to content-type/host/x-lbdb-date; JSON maps are key-sorted
  * (Go's json.Marshal sorts map keys).
  */
object RequestAuth {

  val SignedHeaderNames: Seq[String] = Seq("content-type", "host", "x-lbdb-date")

  case class RequestToken(accessKeyId: String, signedHeaders: Seq[String],
      signature: String) {
    def valid: Boolean =
      accessKeyId.nonEmpty && signedHeaders.nonEmpty && signature.nonEmpty
  }

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  private def sha256(b: Array[Byte]): String =
    hex(MessageDigest.getInstance("SHA-256").digest(b))

  private def hmac(key: String, msg: String): String = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key.getBytes(UTF_8), "HmacSHA256"))
    hex(mac.doFinal(msg.getBytes(UTF_8)))
  }

  def transformHeaderKey(k: String): String = k.toLowerCase.replace('_', '-')

  /** Key-sorted JSON object of a string map (Go json.Marshal semantics for
    * the simple values that appear in headers/query params). */
  private def sortedJson(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) =>
      val sb = new StringBuilder
      Json.string(k, sb); sb.append(':'); Json.string(v, sb)
      sb.toString
    }.mkString("{", ",", "}")

  /** Compute the signature token for a request (client side AND the
    * recompute step of validation). */
  def signRequest(accessKeyId: String, accessKeySecret: String, method: String,
      path: String, headers: Map[String, String], body: Array[Byte],
      queryParams: Map[String, String] = Map.empty): String = {
    val bodyHash = sha256(if (body == null) Array.emptyByteArray else body)
    val signed = headers.map { case (k, v) => transformHeaderKey(k) -> v }
      .filter { case (k, _) => SignedHeaderNames.contains(k) }
    val qp = queryParams.map { case (k, v) => k.toLowerCase -> v }
    val requestString = method +
      "/" + path.dropWhile(_ == '/') +
      sortedJson(signed) +
      (if (qp.nonEmpty) sortedJson(qp) else "{}") +
      bodyHash
    val signedRequest = sha256(requestString.getBytes(UTF_8))
    val date = hmac(accessKeySecret, signed.getOrElse("x-lbdb-date", ""))
    val service = hmac(date, "litebase_request")
    val signature = hmac(service, signedRequest)
    Base64.getEncoder.encodeToString(
      (s"credential=$accessKeyId;signed_headers=${SignedHeaderNames.mkString(",")};" +
        s"signature=$signature").getBytes(UTF_8))
  }

  /** Parse an Authorization header into a token (reference
    * CaptureRequestToken, request_token.go:18-62): base64 of
    * `credential=...;signed_headers=...;signature=...`; any malformed part
    * yields an invalid (empty) token. */
  def captureToken(authorizationHeader: String): RequestToken = {
    val empty = RequestToken("", Nil, "")
    if (authorizationHeader == null || authorizationHeader.isEmpty) return empty
    val decoded =
      try new String(Base64.getDecoder.decode(authorizationHeader), UTF_8)
      catch { case _: IllegalArgumentException => return empty }
    val parts = decoded.split(";").map(_.split("=", 2)).toSeq
    if (parts.exists(_.length != 2)) return empty
    val m = parts.map(p => p(0) -> p(1)).toMap
    if (!Seq("credential", "signed_headers", "signature").forall(m.contains)) return empty
    RequestToken(m("credential"), m("signed_headers").split(",").toSeq, m("signature"))
  }

  /** Validate a captured token against the request (reference
    * RequestSignatureValidator): recompute the chain with the stored
    * secret and constant-time-compare signatures. */
  def validate(token: RequestToken, secret: String, method: String, path: String,
      headers: Map[String, String], body: Array[Byte],
      queryParams: Map[String, String] = Map.empty): Boolean = {
    if (!token.valid) return false
    val recomputed = captureToken(signRequest(token.accessKeyId, secret, method,
      path, headers, body, queryParams))
    MessageDigest.isEqual(recomputed.signature.getBytes(UTF_8),
      token.signature.getBytes(UTF_8))
  }
}
