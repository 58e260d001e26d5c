package graft.core

import org.scalatest.funsuite.AnyFunSuite

/**
 * Golden port of the reference's massive SRC_PATH filter matrix
 * (`/root/reference/test/oph_server_test.c:2813-2839`, 25 filters over
 * the `test/testdata` tree) against a recreation of that exact tree
 * plus two CMIP5-named files (the reference test stubs its FS service,
 * so the convention rows need real DRS names to bite). Match SETS
 * follow the documented semantics (`oph_massive_operations.c:76-199`:
 * bare clause = path, shell globs incl. brace sets, '..'/'~'
 * forbidden, relative paths resolve under an absolute '..'-free cdd);
 * the ERROR rows reproduce the reference test's expected outcomes
 * (cases 17/21/22/23 error, 18 is list-only, 14 fans out twice).
 */
class SrcPathGoldenSpec extends AnyFunSuite {

  private lazy val root: String = {
    val t = java.nio.file.Files.createTempDirectory("graft_srcpath")
    t.toFile.deleteOnExit()
    def mk(rel: String): Unit = {
      val p = t.resolve(rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, "x")
    }
    Seq("testdata/a_12.test", "testdata/a_123.test",
      "testdata/a/c_3.test",
      "testdata/testdata2/b_1.tst", "testdata/testdata2/b_123.tst",
      "testdata/testdata2/b_124.test", "testdata/testdata2/b_13.test",
      // DRS-named additions so convention=cmip5 selects something real
      "testdata/va_vb_vc_vd_ve.nc", "testdata/a/wa_wb_wc_wd_we.nc")
      .foreach(mk)
    t.toString
  }

  private def names(value: String, cdd: String = null): Seq[String] =
    MassiveFilter.expandFiles(value,
      cwd = s"$root/testdata",
      cdd = if (cdd == null) root else cdd)
      .map(p => p.substring(p.lastIndexOf('/') + 1)).sorted

  test("bare path globs expand like the shell (filters 0-3)") {
    assert(names("[testdata/*]") == Seq("a_12.test", "a_123.test",
      "b_1.tst", "b_123.tst", "b_124.test", "b_13.test", "c_3.test",
      "va_vb_vc_vd_ve.nc", "wa_wb_wc_wd_we.nc"))
    assert(names("[testdata/*.test]") == Seq("a_12.test", "a_123.test"))
    assert(names("[testdata/testdata2/*]") ==
      Seq("b_1.tst", "b_123.tst", "b_124.test", "b_13.test"))
    assert(names("[testdata/testdata2/*.tst]") ==
      Seq("b_1.tst", "b_123.tst"))
  }

  test("path= with recursion flags (filters 4-7)") {
    // leading space after '=' is tolerated like the reference parser
    assert(names("[path= testdata;recursive=no]") ==
      Seq("a_12.test", "a_123.test", "va_vb_vc_vd_ve.nc"))
    assert(names("[path=testdata;recursive=yes;]").size == 9)
    assert(names("[path=testdata/testdata2;recursive=no]").size == 4)
    assert(names("[path=testdata/testdata2;recursive=yes]").size == 4)
  }

  test("file= basename globs (filters 8-13)") {
    assert(names("[path=testdata;file=*1*]") ==
      Seq("a_12.test", "a_123.test"))
    assert(names("[path=testdata;file=*1*;recursive=yes]") ==
      Seq("a_12.test", "a_123.test", "b_1.tst", "b_123.tst",
        "b_124.test", "b_13.test"))
    assert(names("[path=testdata;file=*12*;recursive=yes]") ==
      Seq("a_12.test", "a_123.test", "b_123.tst", "b_124.test"))
    assert(names(
      "[path=testdata/testdata2;file=*2*te*;recursive=yes]") ==
      Seq("b_124.test"))
    assert(names("[path=testdata;file=nofile]").isEmpty)
    // {a,b} is a shell brace set, not a literal
    assert(names("[path=testdata;file={nofile}]").isEmpty)
    // shell expansion: {a_12,b_124}* = a_12* OR b_124*, so a_123.test
    // rides the first alternative's prefix
    assert(names("[path=testdata;file={a_12,b_124}*;recursive=yes]") ==
      Seq("a_12.test", "a_123.test", "b_124.test"))
  }

  test("convention=cmip5 selects DRS-named files (filters 14-15)") {
    // the '|'-joined pair fans out over BOTH groups, like the
    // reference's 2-light-task expectation for case 14
    assert(names("[path=testdata;convention=cmip5]|" +
      "[path=testdata/a;convention=cmip5]") ==
      Seq("va_vb_vc_vd_ve.nc", "wa_wb_wc_wd_we.nc"))
    assert(names("[path=testdata;convention=cmip5;recursive=yes]") ==
      Seq("va_vb_vc_vd_ve.nc", "wa_wb_wc_wd_we.nc"))
  }

  test("defaulted path and run=no listing (filters 16, 18)") {
    // no path key: the cwd default applies (the reference descriptor
    // defaults the argument); the brace set still matches nothing
    assert(names("[file={nofile}]").isEmpty)
    // run=no switches to list-only mode and still expands
    val v = "[path=testdata;run=no;measure=measure]"
    assert(!MassiveFilter.parse(v).runEnabled)
    assert(names(v).size == 3)
  }

  test("root glob under cdd and unmatched globs (filters 19-20)") {
    // relative 'path=*' resolves under the cdd, then globs
    assert(names("[path=*;recursive=yes]").size == 9)
    assert(names("[path=testdata/wrong*]").isEmpty)
  }

  test("grammar and sandbox violations error (filters 17, 21-23)") {
    intercept[MassiveFilter.FilterError](names("[wrong"))
    intercept[MassiveFilter.FilterError](names("[..]"))
    // a relative cdd is rejected
    intercept[MassiveFilter.FilterError](
      names("[path=testdata]", cdd = "wrong"))
    // '..' in the cdd is rejected even when absolute
    intercept[MassiveFilter.FilterError](
      names("[path=testdata]", cdd = "/wrong/../wrong"))
    // and '~' anywhere at the head of the path
    intercept[MassiveFilter.FilterError](names("[path=~/testdata]"))
  }

  test("cdd scopes relative paths (filter 24)") {
    assert(names("[path=testdata2]", cdd = s"$root/testdata") ==
      Seq("b_1.tst", "b_123.tst", "b_124.test", "b_13.test"))
  }
}
