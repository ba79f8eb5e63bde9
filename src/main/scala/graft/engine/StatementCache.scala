package graft.engine

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** Prepared-statement cache (B4): LRU of parsed logical plans keyed by
  * (crc32(sql), sha256(accessKeyId)) — the same composite key as the
  * reference's per-connection sync.Map
  * (pkg/database/database_connection.go:726-756).
  */
class StatementCache[P](maxEntries: Int = 256) {
  case class Key(crc: Long, keyHash: String)

  private val map = new java.util.LinkedHashMap[Key, P](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[Key, P]): Boolean =
      size() > maxEntries
  }
  var hits = 0L
  var misses = 0L

  def key(sql: String, accessKeyId: String): Key = {
    val md = MessageDigest.getInstance("SHA-256")
    val hash = md.digest(accessKeyId.getBytes(UTF_8)).map("%02x".format(_)).mkString
    Key(Classifier.checksum(sql), hash)
  }

  def get(sql: String, accessKeyId: String)(parse: => P): P = synchronized {
    val k = key(sql, accessKeyId)
    val cached = map.get(k)
    if (cached != null) { hits += 1; cached }
    else { misses += 1; val p = parse; map.put(k, p); p }
  }

  def size: Int = synchronized(map.size())
}
