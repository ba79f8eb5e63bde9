package graft.engine

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption}
import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

/** Encryption-at-rest for the engine's secret stores, with the reference's
  * two-step key-rotation contract (pkg/auth/key.go, key_manager.go;
  * routes POST /v1/keys + /v1/keys/activate, pkg/http/routes.go:154-167):
  *
  *   1. `storeNext(newKey, signature)` — the caller proves possession of
  *      the CURRENT key by signing the new one with it
  *      (hex(hmacSha256(current, new)), pkg/http/key_controller.go) and the
  *      new key is staged (`NextEncryptionKey`).
  *   2. `activate(newKey)` — only a staged key activates (`HasKey` check,
  *      key_activate_controller.go); the stores re-encrypt under it.
  *
  * The reference encrypts its secrets tree per key under object storage;
  * here the secret stores are single JSON manifests, so encryption is
  * whole-file AES-256-GCM (key = sha256(encryptionKey), random 96-bit
  * nonce, versioned magic header). `.graft_key` persists the active key's
  * hash (InitKey parity) so a restart with the wrong key fails loudly
  * instead of serving garbage. With no key configured everything stays
  * plaintext — encryption is an opt-in, like LITEBASE_ENCRYPTION_KEY.
  */
class KeyManager(root: Path, initialKey: Option[String] = None) {

  private val Magic = "GRAFTENC1".getBytes(UTF_8)

  @volatile private var active: Option[String] = initialKey
  @volatile private var next: Option[String] = None
  // store mutations vs. in-flight rotation: a store persist() between a
  // sidecar prepare and its commit rename would write the LIVE file under
  // the NEW key (encrypt() follows `active`, which flips before phase 1)
  // and then be clobbered by the stale sidecar — and a crash in that
  // window leaves a file under the new key with `.graft_key` still
  // holding the old hash and no marker, bricking the root. Mutators take
  // the read side BEFORE their store monitor; activate() holds the write
  // side for the whole two-phase swap, so no store can persist mid-swap.
  private val rotationGate =
    new java.util.concurrent.locks.ReentrantReadWriteLock()
  // previous key kept for the duration of a rotation: store files not yet
  // re-persisted decrypt via this fallback, so a half-rotated root stays
  // readable in-process and the activation can be retried
  @volatile private var fallback: Option[String] = None
  private var onRotate: Seq[(() => Unit, () => Unit)] = Nil

  Files.createDirectories(root)
  private def keyHashPath = root.resolve(".graft_key")
  private def nextHashPath = root.resolve(".graft_key_next")

  private def sha256hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes(UTF_8))
      .map("%02x".format(_)).mkString

  // InitKey (pkg/auth/key.go:12-36): record the active key's hash; reject
  // a restart under a key that doesn't match what encrypted the stores.
  // The `.graft_key_next` marker appears only AFTER every store has
  // re-persisted under the staged key (see activate()), so its presence
  // means exactly "stores are under the staged key; `.graft_key` may still
  // hold the old hash". A restart with the staged key therefore completes
  // the rotation; a restart with the OLD key is refused with a pointer to
  // the staged key — its hash check would pass, but the stores are no
  // longer readable under it, and silently deleting the marker here would
  // strand them.
  initialKey.foreach { k =>
    val stagedMatch = Files.exists(nextHashPath) &&
      new String(Files.readAllBytes(nextHashPath), UTF_8) == sha256hex(k)
    if (Files.exists(keyHashPath) && !stagedMatch) {
      val stored = new String(Files.readAllBytes(keyHashPath), UTF_8)
      require(stored == sha256hex(k),
        "encryption key does not match the stored key hash")
      if (Files.exists(nextHashPath))
        throw new IllegalStateException(
          "an interrupted key rotation left the stores encrypted under the " +
            "staged key; restart with the staged (new) encryption key to " +
            "complete the rotation")
    }
    if (stagedMatch || !Files.exists(keyHashPath)) writeHash(keyHashPath, k)
    Files.deleteIfExists(nextHashPath) // staged keys don't survive restart
    next = None
  }

  private def writeHash(p: Path, key: String): Unit = {
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp, sha256hex(key).getBytes(UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def encryptionEnabled: Boolean = active.isDefined

  /** Run a store mutation (anything that persists a live store file)
    * serialized against an in-flight rotation. MUST be entered before the
    * store's own monitor — activate() acquires store monitors while
    * holding the write side, so the reverse order would deadlock. */
  def guardMutation[T](f: => T): T = {
    rotationGate.readLock().lock()
    try f finally rotationGate.readLock().unlock()
  }

  /** Stores call this so a rotation can re-encrypt them under the new key
    * in two phases: `prepare` writes the re-encrypted bytes to a SIDECAR
    * (the live file stays under the old key), `commit` atomically renames
    * the sidecar over the live file. The split is what makes a crash at
    * any instant leave a root that boots under at least one of the two
    * rotation keys (see activate()). */
  def registerStore(prepare: () => Unit, commit: () => Unit): Unit =
    synchronized { onRotate = onRotate :+ ((prepare, commit)) }

  /** Single-step store (no sidecar): its re-persist runs in the prepare
    * phase. Used by tests and stores whose loss is acceptable. */
  def registerStore(repersist: () => Unit): Unit =
    registerStore(repersist, () => ())

  private def aesKey(k: String): SecretKeySpec =
    new SecretKeySpec(
      MessageDigest.getInstance("SHA-256").digest(k.getBytes(UTF_8)), "AES")

  def encrypt(plain: Array[Byte]): Array[Byte] = active match {
    case None => plain
    case Some(k) =>
      val iv = new Array[Byte](12)
      new java.security.SecureRandom().nextBytes(iv)
      val c = Cipher.getInstance("AES/GCM/NoPadding")
      c.init(Cipher.ENCRYPT_MODE, aesKey(k), new GCMParameterSpec(128, iv))
      val ct = c.doFinal(plain)
      val out = new Array[Byte](Magic.length + iv.length + ct.length)
      System.arraycopy(Magic, 0, out, 0, Magic.length)
      System.arraycopy(iv, 0, out, Magic.length, iv.length)
      System.arraycopy(ct, 0, out, Magic.length + iv.length, ct.length)
      out
  }

  /** Decrypt a store file. Plaintext files (pre-encryption, or encryption
    * not enabled) pass through, so enabling encryption on an existing root
    * upgrades the files on their next persist. */
  def decrypt(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < Magic.length + 12 ||
        !java.util.Arrays.equals(bytes.take(Magic.length), Magic)) return bytes
    val k = active.getOrElse(
      throw new IllegalStateException("store is encrypted but no encryption key is configured"))
    try gcmDecrypt(k, bytes)
    catch {
      case e: javax.crypto.AEADBadTagException =>
        // mid-rotation: this store hasn't re-persisted yet, so its file is
        // still under the previous key — fall back so a partially-rotated
        // root stays readable and the activation can be retried
        fallback match {
          case Some(fk) =>
            try gcmDecrypt(fk, bytes)
            catch { case _: javax.crypto.AEADBadTagException => throw wrongKey(e) }
          case None => throw wrongKey(e)
        }
    }
  }

  private def wrongKey(cause: Throwable): IllegalStateException =
    new IllegalStateException(
      "store file was encrypted under a different key (possibly an " +
        "interrupted rotation — try the other rotation key)", cause)

  private def gcmDecrypt(k: String, bytes: Array[Byte]): Array[Byte] = {
    val iv = java.util.Arrays.copyOfRange(bytes, Magic.length, Magic.length + 12)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.DECRYPT_MODE, aesKey(k), new GCMParameterSpec(128, iv))
    c.doFinal(java.util.Arrays.copyOfRange(bytes, Magic.length + 12, bytes.length))
  }

  /** Stage the next encryption key (NextEncryptionKey): `signature` must
    * be hex(hmacSha256(currentKey, newKey)) — possession of the current
    * key authorizes the rotation (key_controller.go:43-50). */
  def storeNext(newKey: String, signature: String): Unit = synchronized {
    val cur = active.getOrElse(
      throw new IllegalStateException("encryption is not enabled on this engine"))
    if (cur == newKey)
      throw new IllegalArgumentException(
        "the encryption key is already the current encryption key")
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(cur.getBytes(UTF_8), "HmacSHA256"))
    val expected = mac.doFinal(newKey.getBytes(UTF_8)).map("%02x".format(_)).mkString
    if (!MessageDigest.isEqual(expected.getBytes(UTF_8), signature.getBytes(UTF_8)))
      throw new DeniedException("invalid signature")
    next = Some(newKey)
    // no on-disk marker yet: .graft_key_next appears only inside
    // activate()'s re-encryption window, so the constructor's
    // staged-key acceptance can't mistake a never-activated staging
    // for an interrupted rotation
  }

  /** HasKey analog: only a key staged by storeNext may activate. */
  def hasStaged(key: String): Boolean = synchronized(next.contains(key))

  /** Activate a staged key: it becomes current and every registered store
    * re-persists (re-encrypts) under it (StoreEncryptionKey + the
    * key:activate broadcast collapse to this single-driver swap).
    *
    * Ordering is crash-safe at every instant, two-phase like the stores:
    * phase 1 (prepare) writes each store's re-encrypted bytes to a
    * sidecar while every LIVE file stays under the old key — a crash here
    * boots under the OLD key (stale sidecars fail decryption on load and
    * are discarded). Phase 2 writes the `.graft_key_next` marker (meaning
    * "every sidecar holds the staged key"), atomically renames the
    * sidecars over the live files, commits the `.graft_key` hash and
    * drops the marker — a crash anywhere in phase 2 boots under the NEW
    * key (the constructor's stagedMatch path completes the swap; store
    * loaders adopt a sidecar that decrypts under the active key). If a
    * prepare throws, the key stays staged so the activation can simply be
    * retried, and reads fall back to the previous key meanwhile; a retry
    * preserves the ORIGINAL old key as the fallback. */
  def activate(key: String): Unit = {
    // hold the write side across BOTH phases: no store mutation may
    // persist a live file while `active` is the new key but the live
    // files are still under the old one (see rotationGate)
    rotationGate.writeLock().lock()
    try {
      val stores = synchronized {
        if (!next.contains(key))
          throw new IllegalArgumentException("the encryption key is invalid")
        if (!active.contains(key)) fallback = active
        active = Some(key)
        next = None
        onRotate
      }
      try stores.foreach(_._1()) // phase 1: sidecars under the new key
      catch {
        case e: Throwable =>
          synchronized { next = Some(key) } // re-stage so activate() can retry
          throw e
      }
      synchronized {
        writeHash(nextHashPath, key) // every sidecar holds the new key
        stores.foreach(_._2()) // phase 2: atomic renames
        writeHash(keyHashPath, key)
        Files.deleteIfExists(nextHashPath)
        fallback = None
      }
    } finally rotationGate.writeLock().unlock()
  }
}
