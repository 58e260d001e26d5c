package graft.core

import org.scalatest.funsuite.AnyFunSuite

/**
 * Ported golden suites from the reference server tests:
 *  - the `oph_check_for_massive_operation` filter fixture list
 *    (`/root/reference/test/oph_server_test.c:2415-2461` — every filter
 *    string, asserted against its documented selection semantics on a
 *    fixture catalog mirroring the test DB), and
 *  - the `oph_filters` edge cases (`:3815-3990`) — malformed values
 *    must fail with a FilterError, exactly like the reference's
 *    oph_filter_* error returns (never a stray parse exception).
 */
class FilterGoldenSpec extends AnyFunSuite {

  /** Fixture mirroring the reference test DB: cubes across two
    * containers and a subfolder, with levels, measures, metadata, and
    * one provenance edge. */
  private def fixture(): Catalog = {
    val cat = new Catalog("sess")
    cat.mkdir("/path/to/container")
    val c1 = cat.createContainer("containername", "/")
    val c2 = cat.createContainer("other", "/")
    val c3 = cat.createContainer("nested", "/path/to/container")
    // id 1: the baseline cube
    cat.addCube(c1.id, "measure", level = 1,
      metadata = Map("key" -> "the value", "key1" -> "value1"))
    // id 2: level 2 with both metadata keys
    cat.addCube(c1.id, "measure", level = 2,
      metadata = Map("key1" -> "value1", "key2" -> "value2"))
    // id 3: other measure, level 3
    cat.addCube(c2.id, "other_measure", level = 3)
    // id 4: parent for provenance
    cat.addCube(c2.id, "measure", level = 1)
    // id 5: child of 4
    cat.addCube(c2.id, "measure", level = 10, parents = Seq(4L))
    // id 6: in the subfolder
    cat.addCube(c3.id, "measure", level = 2)
    cat
  }

  private def ids(filterStr: String, cwd: String = "/"): Set[Long] =
    MassiveFilter.expand(filterStr, fixture(), cwd).map(_.id).toSet

  // ---- the reference fixture list, string by string (`:2415-2436`)

  test("[*] / [all] / [] select everything in scope") {
    assert(ids("[*]") == Set(1L, 2L, 3L, 4L, 5L))
    assert(ids("[all]") == Set(1L, 2L, 3L, 4L, 5L))
    assert(ids("[]") == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("[measure=measure]") {
    assert(ids("[measure=measure]") == Set(1L, 2L, 4L, 5L))
  }

  test("[container=containername]") {
    assert(ids("[container=containername]") == Set(1L, 2L))
  }

  test("cube_filter subset forms: 2 / 2:4 / 2:3:10 / 2,3,10") {
    assert(ids("[cube_filter=2]") == Set(2L))
    assert(ids("[cube_filter=2:4]") == Set(2L, 3L, 4L))
    assert(ids("[cube_filter=2:3:10]") == Set(2L, 5L))   // 2,5,8 stride 3
    assert(ids("[cube_filter=2,3,10]") == Set(2L, 3L))   // 10 absent
  }

  test("[metadata_key=key1|key2] requires ALL keys") {
    assert(ids("[metadata_key=key1|key2]") == Set(2L))
  }

  test("[metadata_value=value1|value2] without key errors (No query expected)") {
    intercept[MassiveFilter.FilterError](ids("[metadata_value=value1|value2]"))
  }

  test("[metadata_key=key;metadata_value=value] is a LIKE match") {
    assert(ids("[metadata_key=key;metadata_value=value]") == Set(1L))
  }

  test("[metadata_key=key1|key2;metadata_value=value1|value2] pairwise") {
    assert(ids("[metadata_key=key1|key2;metadata_value=value1|value2]") ==
      Set(2L))
  }

  test("[level=2|3]") {
    assert(ids("[level=2|3]") == Set(2L, 3L))
  }

  test("[path=/path/to/container] with and without recursive") {
    // the 'nested' container lives AT that folder: direct match
    assert(ids("[path=/path/to/container]") == Set(6L))
    assert(ids("[path=/path/to/container;recursive=yes]") == Set(6L))
    // from the root, only recursive descends into the subfolder
    assert(!ids("[path=/]").contains(6L))
    assert(ids("[path=/;recursive=yes]").contains(6L))
  }

  test("combined conjunctive filter (the reference's long case)") {
    // container + metadata + level + path, all ANDed
    assert(ids("[container=containername;metadata_key=key;" +
      "metadata_value=value;level=1;path=/;recursive=yes]") == Set(1L))
  }

  test("bare pid list '1|3|5' resolves explicitly (No query expected)") {
    assert(ids("1|3|5") == Set(1L, 3L, 5L))
  }

  test("'[level=1,3]|[measure=measure]|5' multi-group union + bare pid") {
    // groups union; the comma form of the level list; pid 5 explicit
    assert(ids("[level=1,3]|[measure=measure]|5") == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("'[10]' bare clause is a cube_filter") {
    assert(ids("[10]") == Set.empty[Long]) // no cube id 10 in fixture
    assert(ids("[5]") == Set(5L))
  }

  test("[container_pid=http://localhost/5] and /2") {
    assert(ids("[container_pid=http://localhost/2]") == Set(3L, 4L, 5L))
    assert(ids("[container_pid=http://localhost/5]") == Set.empty[Long])
  }

  test("[parent_cube=http://localhost/3/4] follows provenance") {
    assert(ids("[parent_cube=http://localhost/3/4]") == Set(5L))
  }

  // ---- oph_filters edge cases (`:3815-3990`)

  test("malformed parent_cube pids error like oph_filter_parent") {
    val cat = fixture()
    for (v <- Seq("wrong", "http://localhostwrong", "http://localhost/"))
      intercept[MassiveFilter.FilterError](
        MassiveFilter.expand(s"[parent_cube=$v]", cat))
    // a bare-host pid with a numeric tail parses
    assert(MassiveFilter.expand("[parent_cube=http://localhost/3/4]", cat)
      .map(_.id) == Seq(5L))
  }

  test("malformed container_pid errors like oph_filter_container_pid") {
    val cat = fixture()
    for (v <- Seq("wrong", "http://localhostwrong", ""))
      intercept[MassiveFilter.FilterError](
        MassiveFilter.expand(s"[container_pid=$v]", cat))
  }

  test("cube_filter '1:1:1:1' (too many parts) errors like oph_filter_using_subset") {
    intercept[MassiveFilter.FilterError](ids("[cube_filter=1:1:1:1]"))
    assert(ids("[cube_filter=1:2,3]") == Set(1L, 2L, 3L)) // valid compound
  }

  test("malformed level and depth values error") {
    intercept[MassiveFilter.FilterError](ids("[level=abc]"))
    intercept[MassiveFilter.FilterError](
      ids("[path=/;recursive=yes;depth=deep]"))
  }

  test("empty filter values behave like the reference") {
    // 'level=' with no value: nothing to match on -> empty level set
    // selects nothing (the reference compiles an always-false clause)
    assert(ids("[level=]") == Set.empty[Long])
    // 'measure=' empty matches only empty-named measures -> none
    assert(ids("[measure=]") == Set.empty[Long])
  }
}
