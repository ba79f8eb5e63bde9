package graft.cli

import java.nio.file.{Files, Path}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** One stored connection profile — the client-side analog of the
  * reference's `pkg/cli/config/profile.go:3-23`: a named cluster URL plus
  * either basic-auth or access-key credentials, selected by `type`
  * (`basic_auth` | `access_key`). */
case class Profile(name: String, cluster: String, tpe: String,
    username: String = "", password: String = "",
    accessKeyId: String = "", accessKeySecret: String = "")

/** Client-side profile configuration file, the analog of the reference's
  * `pkg/cli/config/config.go`: a JSON document
  * `{"currentProfile": "...", "profiles": [{name, cluster,
  * credentials: {username, password, accessKeyId, accessKeySecret},
  * type}]}` stored under the user's home directory
  * (config.go:33-43 uses `~/.litebase/config.json`; here
  * `~/.graft/config.json`, overridable for tests and scripts). A missing
  * file is an empty configuration; every mutation rewrites the whole
  * document (config.go Save, :167-181), owner-only when the filesystem
  * supports POSIX permissions (the file carries secrets).
  *
  * `current` falls back to the FIRST profile when no current name is set
  * (config.go GetCurrentProfile:137-151). `delete` removes exactly the
  * named profile — the reference's DeleteProfile (config.go:105-126)
  * breaks out of its filter loop after the first retained entry, silently
  * dropping every later profile; that is a bug, not a semantic, so it is
  * not mirrored. */
class ProfileStore(path: Path) {
  private val mapper = new ObjectMapper()

  private def load(): (String, Vector[Profile]) = {
    if (!Files.isRegularFile(path)) return ("", Vector.empty)
    val root = mapper.readTree(Files.readString(path))
    val ps = (0 until root.path("profiles").size()).map { i =>
      val n = root.path("profiles").get(i)
      val c = n.path("credentials")
      Profile(n.path("name").asText(), n.path("cluster").asText(),
        n.path("type").asText(),
        c.path("username").asText(""), c.path("password").asText(""),
        c.path("accessKeyId").asText(""), c.path("accessKeySecret").asText(""))
    }.toVector
    (root.path("currentProfile").asText(""), ps)
  }

  private def save(currentName: String, ps: Vector[Profile]): Unit = {
    val root: ObjectNode = mapper.createObjectNode()
    root.put("currentProfile", currentName)
    val arr = root.putArray("profiles")
    ps.foreach { p =>
      val n = arr.addObject()
      n.put("name", p.name); n.put("cluster", p.cluster)
      val c = n.putObject("credentials")
      c.put("username", p.username); c.put("password", p.password)
      c.put("accessKeyId", p.accessKeyId)
      c.put("accessKeySecret", p.accessKeySecret)
      n.put("type", p.tpe)
    }
    if (path.getParent != null) Files.createDirectories(path.getParent)
    // the document carries secrets: write owner-only from the FIRST byte
    // (never 0644-then-chmod — that leaves a world-readable window) and
    // replace atomically so a crash mid-write can't truncate the config
    // every later invocation parses (r11 review)
    val dir = Option(path.getParent).getOrElse(java.nio.file.Path.of("."))
    val tmp =
      try Files.createTempFile(dir, ".config", ".tmp",
        java.nio.file.attribute.PosixFilePermissions.asFileAttribute(
          java.nio.file.attribute.PosixFilePermissions.fromString("rw-------")))
      catch { case _: UnsupportedOperationException =>
        Files.createTempFile(dir, ".config", ".tmp")
      }
    Files.writeString(tmp,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    try Files.move(tmp, path,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, path, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def profiles: Vector[Profile] = load()._2

  def currentName: String = load()._1

  def current: Option[Profile] = {
    val (cur, ps) = load()
    if (cur.isEmpty) ps.headOption else ps.find(_.name == cur)
  }

  def add(p: Profile): Either[String, Unit] = {
    val (cur, ps) = load()
    if (ps.exists(_.name == p.name))
      Left(s"profile with this name already exists: ${p.name}")
    else Right(save(cur, ps :+ p))
  }

  def delete(name: String): Either[String, Unit] = {
    val (cur, ps) = load()
    if (!ps.exists(_.name == name)) Left(s"profile not found: $name")
    // deleting the current profile clears the marker (current falls back
    // to the first remaining profile, matching GetCurrentProfile)
    else Right(save(if (cur == name) "" else cur, ps.filterNot(_.name == name)))
  }

  def switch(name: String): Either[String, Unit] = {
    val (_, ps) = load()
    if (!ps.exists(_.name == name)) Left(s"profile not found: $name")
    else Right(save(name, ps))
  }
}

object ProfileStore {
  val validTypes = Set("access_key", "basic_auth")

  /** GRAFT_CONFIG override, else `~/.graft/config.json`. */
  def defaultPath: Path = sys.env.get("GRAFT_CONFIG").map(Path.of(_))
    .getOrElse(Path.of(sys.props("user.home"), ".graft", "config.json"))
}
