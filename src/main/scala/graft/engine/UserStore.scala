package graft.engine

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption}
import java.security.MessageDigest
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Persisted user accounts (reference pkg/auth/user.go +
  * user_manager.go): username, password, policy statements. Passwords are
  * stored as salted PBKDF2-HMAC-SHA256 digests (`pbkdf2$<iters>$<hex>`) —
  * the JDK's adaptive KDF standing in for the reference's bcrypt
  * (user_manager.go bcrypt.GenerateFromPassword) so offline brute-force of
  * a leaked _users.json stays expensive. `authenticate` recomputes and
  * constant-time-compares; hashes from older files (plain salted SHA-256)
  * still verify and re-hash on the next password change. The `root`
  * username is reserved (reference user_controller.go:116). */
case class User(username: String, passwordHash: String, salt: String,
    statements: Seq[AccessKeyStatement], createdAt: Long, updatedAt: Long)

class UserStore(root: Path, keyManager: Option[KeyManager] = None) {

  private val users = mutable.LinkedHashMap[String, User]()
  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  Files.createDirectories(root)
  load()
  keyManager.foreach(_.registerStore(() => prepareRotation(), () => commitRotation()))

  /** Mutations serialize against an in-flight key rotation (gate entered
    * BEFORE the store monitor — see KeyManager.guardMutation): a persist
    * mid-rotation would land under the new key and be clobbered by the
    * stale sidecar rename. */
  private def guarded[T](f: => T): T =
    keyManager.map(_.guardMutation(f)).getOrElse(f)

  /** Re-write the store (a key rotation re-encrypts under the new key). */
  def repersist(): Unit = guarded(synchronized(persist()))

  /** Rotation phase 1: write the re-encrypted bytes to a sidecar; the
    * live file stays under the previous key until commitRotation(). */
  def prepareRotation(): Unit = synchronized {
    Files.write(rotPath, encode(serialize()))
  }

  /** Rotation phase 2: atomically adopt the sidecar. */
  def commitRotation(): Unit = synchronized {
    if (Files.exists(rotPath))
      Files.move(rotPath, path, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
  }

  private def encode(b: Array[Byte]): Array[Byte] =
    keyManager.map(_.encrypt(b)).getOrElse(b)
  private def decode(b: Array[Byte]): Array[Byte] =
    keyManager.map(_.decrypt(b)).getOrElse(b)

  private def path = root.resolve("_users.json")
  private def rotPath = root.resolve("_users.json.rot")

  private val Pbkdf2Iterations = 100000

  private def pbkdf2(password: String, salt: String, iterations: Int): String = {
    val spec = new javax.crypto.spec.PBEKeySpec(password.toCharArray,
      salt.getBytes(UTF_8), iterations, 256)
    val derived = javax.crypto.SecretKeyFactory
      .getInstance("PBKDF2WithHmacSHA256").generateSecret(spec).getEncoded
    s"pbkdf2$$$iterations$$" + derived.map("%02x".format(_)).mkString
  }

  private def hash(password: String, salt: String): String =
    pbkdf2(password, salt, Pbkdf2Iterations)

  private def legacyHash(password: String, salt: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest((salt + ":" + password).getBytes(UTF_8))
      .map("%02x".format(_)).mkString

  private def serialize(): Array[Byte] = {
    val arr = om.createArrayNode()
    users.values.foreach { u =>
      val n = arr.addObject()
      n.put("username", u.username)
      n.put("password_hash", u.passwordHash)
      n.put("salt", u.salt)
      n.put("created_at", u.createdAt)
      n.put("updated_at", u.updatedAt)
      val sts = n.putArray("statements")
      u.statements.foreach { st =>
        val sn = sts.addObject()
        sn.put("effect", st.effect); sn.put("resource", st.resource)
        val as = sn.putArray("actions"); st.actions.foreach(as.add)
      }
    }
    om.writeValueAsBytes(arr)
  }

  private def persist(): Unit = {
    val tmp = root.resolve("_users.json.tmp")
    Files.write(tmp, encode(serialize()))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** A rotation sidecar that decrypts under the ACTIVE key and parses is
    * an interrupted phase-2 rename — adopt it. One that doesn't is debris
    * from a rotation that never committed — discard it. */
  private def adoptRotationSidecar(): Option[Array[Byte]] = {
    if (!Files.exists(rotPath)) return None
    try {
      val bytes = decode(Files.readAllBytes(rotPath))
      om.readTree(bytes) // validate BEFORE adopting
      Files.move(rotPath, path, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      Some(bytes)
    } catch {
      case scala.util.control.NonFatal(_) =>
        try Files.deleteIfExists(rotPath)
        catch { case _: java.io.IOException => () }
        None
    }
  }

  private def load(): Unit = {
    val bytes = adoptRotationSidecar().orElse {
      if (Files.exists(path)) Some(decode(Files.readAllBytes(path))) else None
    }
    if (bytes.isEmpty) return
    om.readTree(bytes.get).elements().asScala.foreach { n =>
      val statements = n.path("statements").elements().asScala.map { sn =>
        AccessKeyStatement(sn.path("effect").asText(),
          sn.path("resource").asText(),
          sn.path("actions").elements().asScala.map(_.asText()).toSeq)
      }.toSeq
      val u = User(n.path("username").asText(), n.path("password_hash").asText(),
        n.path("salt").asText(), statements,
        n.path("created_at").asLong(), n.path("updated_at").asLong())
      users(u.username) = u
    }
  }

  def add(username: String, password: String,
      statements: Seq[AccessKeyStatement]): User = guarded(synchronized {
    require(username != "root", "cannot create root user")
    require(!users.contains(username), s"user $username already exists")
    val now = System.currentTimeMillis()
    val salt = java.util.UUID.randomUUID().toString
    val u = User(username, hash(password, salt), salt, statements, now, now)
    users(username) = u
    persist()
    u
  })

  def get(username: String): Option[User] = synchronized(users.get(username))

  def list(): Seq[User] = synchronized(users.values.toSeq)

  /** Verify a password. The (deliberately slow) key derivation runs
    * OUTSIDE the store lock — holding the monitor for ~100 ms per Basic
    * request would serialize every handler thread behind one login — and
    * unknown usernames burn the same derivation so response timing does
    * not reveal which accounts exist. */
  def authenticate(username: String, password: String): Boolean =
    synchronized(users.get(username)) match {
      case Some(u) =>
        val computed = u.passwordHash.split("\\$", 3) match {
          case Array("pbkdf2", iters, _) if iters.nonEmpty && iters.forall(_.isDigit) =>
            pbkdf2(password, u.salt, iters.toInt)
          case _ => legacyHash(password, u.salt)
        }
        MessageDigest.isEqual(
          computed.getBytes(UTF_8), u.passwordHash.getBytes(UTF_8))
      case None =>
        pbkdf2(password, "graft-no-such-user", Pbkdf2Iterations)
        false
    }

  def update(username: String, password: Option[String],
      statements: Option[Seq[AccessKeyStatement]]): Option[User] =
    guarded(synchronized {
      users.get(username).map { u =>
        val salt = java.util.UUID.randomUUID().toString
        val nu = u.copy(
          passwordHash = password.map(hash(_, salt)).getOrElse(u.passwordHash),
          salt = password.map(_ => salt).getOrElse(u.salt),
          statements = statements.getOrElse(u.statements),
          updatedAt = System.currentTimeMillis())
        users(username) = nu
        persist()
        nu
      }
    })

  def remove(username: String): Boolean = guarded(synchronized {
    val existed = users.remove(username).isDefined
    if (existed) persist()
    existed
  })
}
