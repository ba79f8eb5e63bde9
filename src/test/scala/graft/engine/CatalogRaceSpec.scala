package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Drop-vs-pending-snapshot ordering: a snapshot thunk captured before a
  * branch drop must never re-create the deleted manifest file (the
  * tombstone fence in writeBranchManifest discards it), while a later
  * branch of the same name writes normally again. */
class CatalogRaceSpec extends AnyFunSuite {

  private def manifest(root: java.nio.file.Path, db: String, br: String) =
    root.resolve(db).resolve(br).resolve("_manifest.json")

  test("a late snapshot thunk cannot resurrect a dropped branch's manifest") {
    val root = Files.createTempDirectory("graft-cat-race")
    val cat = new Catalog(root)
    cat.createDatabase("db")
    cat.createBranch("db", "main", "b1")
    assert(Files.exists(manifest(root, "db", "b1")))
    // a mutation's snapshot whose file IO hasn't run yet when the drop lands
    val late = cat.snapshotBranch("db", "b1")
    cat.dropBranch("db", "b1")
    assert(!Files.exists(manifest(root, "db", "b1")))
    late() // the delayed IO fires after the drop
    assert(!Files.exists(manifest(root, "db", "b1")),
      "pending snapshot resurrected a dropped branch's manifest")
    // re-creating the name lifts the tombstone: snapshots write again
    cat.createBranch("db", "main", "b1")
    assert(Files.exists(manifest(root, "db", "b1")))
    cat.snapshotBranch("db", "b1")()
    assert(Files.exists(manifest(root, "db", "b1")))
  }

  test("dropDatabase fences every branch and recreation starts empty") {
    val root = Files.createTempDirectory("graft-cat-race2")
    val cat = new Catalog(root)
    cat.createDatabase("db")
    cat.createBranch("db", "main", "dev")
    val lateMain = cat.snapshotBranch("db", "main")
    val lateDev = cat.snapshotBranch("db", "dev")
    cat.dropDatabase("db")
    lateMain(); lateDev()
    assert(!Files.exists(manifest(root, "db", "main")))
    assert(!Files.exists(manifest(root, "db", "dev")))
    cat.createDatabase("db")
    assert(Files.exists(manifest(root, "db", "main")))
    assert(cat.tableNames("db", "main").isEmpty)
  }
}
