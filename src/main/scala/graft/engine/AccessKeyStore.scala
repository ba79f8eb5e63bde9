package graft.engine

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Persisted access-key CRUD (reference pkg/auth/access_key_manager.go:
  * keys live in object storage under access_keys/<id> and are served from
  * an in-memory cache). Here: one JSON manifest under the catalog root,
  * rewritten atomically on every mutation — tiny, like the catalog
  * manifest, and it survives process restarts. */
class AccessKeyStore(root: Path, keyManager: Option[KeyManager] = None) {

  private val keys = mutable.LinkedHashMap[String, AccessKey]()
  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  Files.createDirectories(root)
  load()
  keyManager.foreach(_.registerStore(() => prepareRotation(), () => commitRotation()))

  /** Mutations serialize against an in-flight key rotation (the gate is
    * entered BEFORE the store monitor — see KeyManager.guardMutation for
    * the lock order): a persist between the rotation's sidecar prepare
    * and its commit rename would otherwise land under the new key and be
    * clobbered by the stale sidecar. */
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

  private def path = root.resolve("_access_keys.json")
  private def rotPath = root.resolve("_access_keys.json.rot")

  private def serialize(): Array[Byte] = {
    val rootNode = om.createArrayNode()
    keys.values.foreach { k =>
      val n = rootNode.addObject()
      n.put("access_key_id", k.id)
      n.put("access_key_secret", k.secret)
      n.put("description", k.description)
      n.put("created_at", k.createdAt)
      n.put("updated_at", k.updatedAt)
      val sts = n.putArray("statements")
      k.statements.foreach { st =>
        val sn = sts.addObject()
        sn.put("effect", st.effect)
        sn.put("resource", st.resource)
        val as = sn.putArray("actions"); st.actions.foreach(as.add)
      }
    }
    om.writeValueAsBytes(rootNode)
  }

  private def persist(): Unit = synchronized {
    val tmp = root.resolve("_access_keys.json.tmp")
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
      val k = AccessKey(n.path("access_key_id").asText(),
        n.path("access_key_secret").asText(), n.path("description").asText(),
        statements, n.path("created_at").asLong(), n.path("updated_at").asLong())
      keys(k.id) = k
    }
  }

  /** Create a key with a generated id/secret (reference
    * access_key_manager.go Create: random id + secret). */
  def create(description: String, statements: Seq[AccessKeyStatement]): AccessKey =
    guarded(synchronized {
      val now = System.currentTimeMillis()
      val k = AccessKey(
        "lbdbak_" + java.util.UUID.randomUUID().toString.replace("-", "").take(16),
        java.util.UUID.randomUUID().toString.replace("-", "") +
          java.util.UUID.randomUUID().toString.replace("-", ""),
        description, statements, now, now)
      keys(k.id) = k
      persist()
      k
    })

  /** Insert a caller-constructed key (tests, bootstrap). */
  def put(k: AccessKey): AccessKey = guarded(synchronized {
    keys(k.id) = k; persist(); k
  })

  def get(id: String): Option[AccessKey] = synchronized(keys.get(id))

  def list(): Seq[AccessKey] = synchronized(keys.values.toSeq)

  def update(id: String, description: Option[String],
      statements: Option[Seq[AccessKeyStatement]]): Option[AccessKey] =
    guarded(synchronized {
      keys.get(id).map { k =>
        val nk = k.copy(
          description = description.getOrElse(k.description),
          statements = statements.getOrElse(k.statements),
          updatedAt = System.currentTimeMillis())
        keys(id) = nk
        persist()
        nk
      }
    })

  def delete(id: String): Boolean = guarded(synchronized {
    val existed = keys.remove(id).isDefined
    if (existed) persist()
    existed
  })
}
