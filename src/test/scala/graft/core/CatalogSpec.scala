package graft.core

import org.scalatest.funsuite.AnyFunSuite

/**
 * Catalog + massive-filter spec. The filter cases mirror the
 * reference's golden suite (`/root/reference/test/oph_server_test.c:
 * 2415-2455`) — where the reference asserts generated OphidiaDB SQL,
 * we assert the selected cube-id sets on an equivalent fixture.
 */
class CatalogSpec extends AnyFunSuite {

  /** Fixture: /sess/{c1,sub/c2}; 5 cubes with varied measure/level/
    * metadata/provenance. */
  private def fixture(): Catalog = {
    val cat = new Catalog("sess")
    val c1 = cat.createContainer("containername", "/")
    val c2 = cat.createContainer("other", "/sub")
    cat.addCube(c1.id, "measure", level = 1,
      metadata = Map("key" -> "somevalue", "key1" -> "value1"))        // id 1
    cat.addCube(c1.id, "tas", level = 2,
      metadata = Map("key1" -> "value1", "key2" -> "value2"))          // id 2
    cat.addCube(c1.id, "measure", level = 3, parents = Seq(1L))        // id 3
    cat.addCube(c2.id, "pr", level = 2,
      metadata = Map("key" -> "xx"))                                   // id 4
    cat.addCube(c2.id, "measure", level = 5, parents = Seq(3L, 4L))    // id 5
    cat
  }

  private def ids(cat: Catalog, filter: String, cwd: String = "/"): Set[Long] =
    MassiveFilter.expand(filter, cat, cwd).map(_.id).toSet

  // ------------------------------------------------- golden filters

  test("[*], [all], [] select everything in the cwd scope (reference always path-scopes)") {
    val cat = fixture()
    assert(ids(cat, "[*]") == Set(1L, 2L, 3L))
    assert(ids(cat, "[all]") == Set(1L, 2L, 3L))
    assert(ids(cat, "[]") == Set(1L, 2L, 3L))
    assert(ids(cat, "[path=/;recursive=yes]") == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("[measure=measure]") {
    assert(ids(fixture(), "[measure=measure]") == Set(1L, 3L))
    assert(ids(fixture(), "[measure=measure;recursive=yes]") == Set(1L, 3L, 5L))
  }

  test("[container=containername]") {
    assert(ids(fixture(), "[container=containername]") == Set(1L, 2L, 3L))
  }

  test("[cube_filter=...] subset semantics on the cube id") {
    val cat = fixture()
    assert(ids(cat, "[cube_filter=2]") == Set(2L))
    assert(ids(cat, "[cube_filter=2:4;recursive=yes]") == Set(2L, 3L, 4L))
    assert(ids(cat, "[cube_filter=2:3:10;recursive=yes]") == Set(2L, 5L))
    assert(ids(cat, "[cube_filter=2,3,10]") == Set(2L, 3L))
    assert(ids(cat, "[10]") == Set.empty) // bare clause = cube_filter
  }

  test("[metadata_key=key1|key2] requires ALL keys") {
    assert(ids(fixture(), "[metadata_key=key1|key2]") == Set(2L))
  }

  test("[metadata_key=key;metadata_value=value] is a LIKE match") {
    assert(ids(fixture(), "[metadata_key=key;metadata_value=value]") == Set(1L))
    assert(ids(fixture(), "[metadata_key=key;metadata_value=VALUE]") == Set(1L))
  }

  test("pairwise metadata_key/metadata_value lists") {
    assert(ids(fixture(),
      "[metadata_key=key1|key2;metadata_value=value1|value2]") == Set(2L))
  }

  test("[metadata_value=...] without metadata_key errors") {
    intercept[MassiveFilter.FilterError](
      ids(fixture(), "[metadata_value=value]"))
  }

  test("metadata_key! with metadata_value errors (reference conflict rule)") {
    intercept[MassiveFilter.FilterError](
      ids(fixture(), "[metadata_key!=key;metadata_value=value]"))
  }

  test("[level=2|3]") {
    assert(ids(fixture(), "[level=2|3]") == Set(2L, 3L))
    assert(ids(fixture(), "[level=2|3;recursive=yes]") == Set(2L, 3L, 4L))
  }

  test("negated filters") {
    assert(ids(fixture(), "[measure!=measure]") == Set(2L))
    assert(ids(fixture(), "[level!=2|3;recursive=yes]") == Set(1L, 5L))
  }

  test("[path=...] with and without recursive") {
    val cat = fixture()
    assert(ids(cat, "[path=/]") == Set(1L, 2L, 3L))
    assert(ids(cat, "[path=/;recursive=yes]") == Set(1L, 2L, 3L, 4L, 5L))
    assert(ids(cat, "[path=/sub]") == Set(4L, 5L))
  }

  test("[container_pid=http://localhost/2]") {
    assert(ids(fixture(),
      "[container_pid=http://localhost/2;recursive=yes]") == Set(4L, 5L))
    assert(ids(fixture(), "[container_pid=http://localhost/2]") == Set.empty)
  }

  test("[parent_cube=pid] follows provenance") {
    assert(ids(fixture(),
      "[parent_cube=http://localhost/1/3;recursive=yes]") == Set(5L))
    assert(ids(fixture(), "[parent_cube=http://localhost/1/1]") == Set(3L))
  }

  test("combined conjunctive filter") {
    assert(ids(fixture(),
      "[measure=measure;level=3;container=containername]") == Set(3L))
  }

  test("multiple groups union; bare pids resolve explicitly") {
    val cat = fixture()
    assert(ids(cat, "[level=1]|[measure=tas]") == Set(1L, 2L))
    assert(ids(cat, "[level=1]|http://localhost/2/4") == Set(1L, 4L))
    // bare pids are NOT massive: no filter applies to them
    assert(ids(cat, "1|3|5") == Set(1L, 3L, 5L))
  }

  test("run=no disables execution but still lists") {
    val spec = MassiveFilter.parse("[run=no]")
    assert(!spec.runEnabled)
    assert(ids(fixture(), "[run=no]") == Set(1L, 2L, 3L))
  }

  test("unknown filter key errors") {
    intercept[MassiveFilter.FilterError](ids(fixture(), "[nope=1]"))
  }

  test("negated container / container_pid / cube_filter forms") {
    val cat = fixture()
    assert(ids(cat, "[container!=containername;path=/;recursive=yes]") ==
      Set(4L, 5L))
    assert(ids(cat, "[container_pid!=http://localhost/2;recursive=yes]") ==
      Set(1L, 2L, 3L))
    assert(ids(cat, "[cube_filter!=2:4;recursive=yes]") == Set(1L, 5L))
    assert(ids(cat, "[metadata_key!=key]") == Set(2L, 3L))
  }

  test("recursive path with depth bound in the filter grammar") {
    val cat = new Catalog("sess")
    val top = cat.createContainer("t", "/")
    val deep = cat.createContainer("d", "/a/b")
    cat.addCube(top.id, "m")   // id 1 at /sess
    cat.addCube(deep.id, "m")  // id 2 at /sess/a/b
    assert(ids(cat, "[path=/;recursive=yes]") == Set(1L, 2L))
    assert(ids(cat, "[path=/;recursive=yes;depth=1]") == Set(1L))
    assert(ids(cat, "[path=/;recursive=yes;depth=2]") == Set(1L, 2L))
  }

  test("cube_filter 'end' resolves to the max cube id") {
    val cat = fixture()
    assert(ids(cat, "[cube_filter=3:end;recursive=yes]") == Set(3L, 4L, 5L))
  }

  // ----------------------------------------------------- VFS / DDL

  test("mkdir/resolve/mv") {
    val cat = new Catalog("sess")
    cat.mkdir("/a/b")
    assert(cat.listFolders("/a") == Seq("/sess/a", "/sess/a/b"))
    assert(cat.resolve("b", "/a") == "/sess/a/b")
    assert(cat.resolve("../x", "/a/b") == "/sess/a/x")
    cat.mv("/a", "/z")
    assert(cat.listFolders("/z") == Seq("/sess/z", "/sess/z/b"))
  }

  test("rmdir refuses non-empty folders") {
    val cat = new Catalog("sess")
    cat.mkdir("/a/b")
    intercept[IllegalArgumentException](cat.rmdir("/a"))
    cat.rmdir("/a/b")
    cat.rmdir("/a")
    assert(cat.listFolders("/") == Seq("/sess"))
  }

  test("container delete goes to trash and restores") {
    val cat = new Catalog("sess")
    val c = cat.createContainer("c", "/")
    cat.addCube(c.id, "m")
    intercept[IllegalStateException](cat.deleteContainer("c", "/"))
    cat.deleteContainer("c", "/", force = true)
    assert(cat.allCubes.isEmpty)
    val restored = cat.restoreContainer("c")
    assert(restored.id == c.id)
  }

  test("metadata CRUD and search") {
    val cat = new Catalog("sess")
    val c = cat.createContainer("c", "/")
    val e = cat.addCube(c.id, "m")
    cat.setMetadata(e.id, "units", "kelvin")
    assert(cat.search(metadataKey = Some("units")).map(_.id) == Seq(e.id))
    assert(cat.search(metadataValue = Some("KELV")).map(_.id) == Seq(e.id))
    cat.dropMetadata(e.id, "units")
    assert(cat.search(metadataKey = Some("units")).isEmpty)
  }

  test("provenance graph walks both directions") {
    val cat = fixture()
    val edges = cat.provenance(3L).toSet
    assert(edges.contains((1L, 3L)))
    assert(edges.contains((3L, 5L)))
    assert(!edges.contains((4L, 5L)) || edges.contains((4L, 5L))) // 4->5 reachable downstream
  }

  test("listCubes depth bound") {
    val cat = new Catalog("sess")
    val top = cat.createContainer("t", "/")
    val deep = cat.createContainer("d", "/a/b/c")
    cat.addCube(top.id, "m")   // id 1 at /sess
    cat.addCube(deep.id, "m")  // id 2 at /sess/a/b/c
    assert(cat.listCubes("/", recursive = true).size == 2)
    assert(cat.listCubes("/", recursive = true, depth = 1).map(_.id) == Seq(1L))
  }
}
