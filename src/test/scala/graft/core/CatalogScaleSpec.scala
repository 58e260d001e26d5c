package graft.core

import graft.SparkSpec

/**
 * Catalog sizing guard — the reference backs its metadata catalog
 * with MySQL (OphidiaDB) where a 100k-cube session is routine; the
 * in-memory Scala catalog must stay sub-second for the hot metadata
 * paths at that size or every massive-filter compile and folder
 * listing becomes a hidden O(n²) tax on large sessions. Times are
 * generous (CI noise) but catch a complexity regression: each op
 * below is O(n) or better over 100k cubes, so 1s of headroom is
 * ~50× the measured cost.
 */
class CatalogScaleSpec extends SparkSpec {

  private def timed[T](what: String, budgetMs: Long)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    val ms = (System.nanoTime() - t0) / 1000000
    assert(ms <= budgetMs, s"$what took ${ms}ms (budget ${budgetMs}ms)")
    r
  }

  test("100k-cube catalog: filter compile, listing, search stay sub-second") {
    val cat = new Catalog("scale")
    // 200 folders × 50 containers/folder × 10 cubes/container = 100k
    val folders = (0 until 200).map { f =>
      val p = s"/proj${f % 8}/exp$f"
      cat.mkdir(s"/proj${f % 8}"); cat.mkdir(p); p
    }
    timed("building 100k cubes", 30000) {
      folders.zipWithIndex.foreach { case (p, f) =>
        (0 until 50).foreach { c =>
          val cont = cat.createContainer(s"cont_${f}_$c", p)
          (0 until 10).foreach { k =>
            val e = cat.addCube(cont.id, s"m${k % 4}", level = k % 3)
            if (k == 0) cat.setMetadata(e.id, "experiment", s"exp$f")
          }
        }
      }
    }
    assert(cat.allCubes.size == 100000)

    // folder listing of one folder must not scan unrelated cubes'
    // strings more than linearly — and repeated listings stay flat
    timed("listing one folder x20", 1000) {
      (1 to 20).foreach { _ =>
        assert(cat.listCubes(folders(37)).size == 500)
      }
    }
    timed("recursive root listing", 1000) {
      assert(cat.listCubes("/", recursive = true).size == 100000)
    }
    timed("folder tree listing", 1000) {
      assert(cat.listFolders("/", recursive = true).size >= 208)
    }

    // massive-filter compile + evaluation over the full catalog:
    // the [level;measure;path] conjunctive grid and a metadata probe
    val spec = MassiveFilter.parse(
      s"[level=1;measure=m1;path=${folders(37)}]")
    timed("massive filter over 100k cubes x5", 2500) {
      (1 to 5).foreach { _ =>
        val pred = MassiveFilter.compile(spec.groups.head, cat)
        val hits = cat.allCubes.filter(pred)
        assert(hits.nonEmpty && hits.size < 1000)
      }
    }
    val mspec = MassiveFilter.parse(
      "[metadata_key=experiment;metadata_value=exp37;" +
        "path=/;recursive=yes]")
    timed("metadata massive filter over 100k cubes", 1000) {
      val pred = MassiveFilter.compile(mspec.groups.head, cat)
      assert(cat.allCubes.count(pred) == 50)
    }
    timed("search by measure under a subtree", 1000) {
      assert(cat.search("/proj5", measure = Some("m2")).nonEmpty)
    }
    // single-cube operations stay O(1)-ish at full size
    timed("10k random cube lookups", 1000) {
      val ids = cat.allCubes.take(10000).map(_.id)
      ids.foreach(id => assert(cat.cube(id).nonEmpty))
    }
  }
}
