package graft.engine

import java.util.Locale

/** Statement classifier (B1): prefix classification deciding read vs write
  * path, ported semantics from reference pkg/database/query.go:46-102
  * (case-insensitive prefix match with the same minimum-length guards).
  */
object Classifier {

  private def hasPrefix(s: String, p: String): Boolean =
    s.regionMatches(true, 0, p, 0, p.length)

  def isDDL(stmt: String): Boolean =
    stmt.length >= 6 && (hasPrefix(stmt, "create") || hasPrefix(stmt, "alter") ||
      hasPrefix(stmt, "drop"))

  def isDML(stmt: String): Boolean =
    stmt.length >= 6 && (hasPrefix(stmt, "insert") || hasPrefix(stmt, "update") ||
      hasPrefix(stmt, "delete"))

  def isDQL(stmt: String): Boolean =
    stmt.length >= 6 && hasPrefix(stmt, "select")

  def isPragma(stmt: String): Boolean =
    stmt.length >= 6 && hasPrefix(stmt, "pragma")

  def isVacuum(stmt: String): Boolean =
    stmt.length >= 6 && hasPrefix(stmt, "vacuum")

  def isTransactionStart(stmt: String): Boolean =
    stmt.length >= 5 && hasPrefix(stmt, "begin")

  def isTransactionEnd(stmt: String): Boolean =
    stmt.length >= 3 && (hasPrefix(stmt, "commit") || hasPrefix(stmt, "end"))

  def isTransactionRollback(stmt: String): Boolean =
    stmt.length >= 6 && hasPrefix(stmt, "rollback")

  def isRead(stmt: String): Boolean = isDQL(stmt)

  /** Reference quirk preserved: PRAGMA counts as a write (it is forwarded
    * to the primary and serialized through the write queue). */
  def isWrite(stmt: String): Boolean = isDDL(stmt) || isDML(stmt) || isPragma(stmt)

  /** Statement kind as a label (for routing + the classifier demo query). */
  def kind(stmt: String): String =
    if (isDQL(stmt)) "dql"
    else if (isDML(stmt)) "dml"
    else if (isDDL(stmt)) "ddl"
    else if (isPragma(stmt)) "pragma"
    else if (isVacuum(stmt)) "vacuum"
    else if (isTransactionStart(stmt)) "begin"
    else if (isTransactionRollback(stmt)) "rollback"
    else if (isTransactionEnd(stmt)) "commit"
    else "other"

  /** Statement checksum used as the metrics key (the reference keys metrics
    * by a statement hash; we use crc32 like its statement cache,
    * pkg/database/database_connection.go:726-756). */
  def checksum(stmt: String): Long = {
    val crc = new java.util.zip.CRC32()
    crc.update(stmt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    crc.getValue
  }

  /** Normalized statement for cache keys (trim + collapse whitespace). */
  def normalize(stmt: String): String =
    stmt.trim.replaceAll("\\s+", " ").toLowerCase(Locale.ROOT)
}
