package graft.core

import scala.collection.mutable

/**
 * Session-scoped metadata catalog — the Spark-native stand-in for
 * OphidiaDB (`/root/reference/src/oph_ophidiadb_query.h`,
 * `src/oph_ophidiadb_fs_library.h`): a virtual filesystem of folders,
 * containers and cube descriptors, plus per-cube metadata and
 * provenance.
 *
 * All state is driver-side (metadata is tiny even when the data is
 * 100 TB); the data plane lives in DataFrames referenced by the cube
 * descriptors. Mutations are synchronized so a workflow scheduler can
 * run tasks concurrently.
 *
 * Deleted containers go to a trash area and can be restored —
 * oph_deletecontainer / oph_restorecontainer semantics
 * (`src/oph_json/oph_json_objkeys.h:107,126`).
 */
object Catalog {
  /** A container: named collection of cubes inside a folder. */
  final case class Container(id: Long, name: String, folder: String)

  /** A catalogued cube: the `datacube` row + metadata satellites. */
  final case class Entry(
      id: Long,
      containerId: Long,
      measure: String,
      level: Int,
      metadata: Map[String, String],
      parents: Seq[Long],
      sourceTask: Option[String]) {
    def pid(cat: Catalog): String = s"${cat.webServer}/$containerId/$id"
  }
}

final class Catalog(val sessionCode: String, val webServer: String = "http://localhost") {
  import Catalog.{Container, Entry}

  val root = s"/$sessionCode"

  private val folders = mutable.Set[String](root)
  private val containers = mutable.Map[Long, Container]()
  private val trash = mutable.Map[Long, Container]()
  private val cubes = mutable.LinkedHashMap[Long, Entry]()
  private var nextContainerId = 0L
  private var nextCubeId = 0L

  // ------------------------------------------------------------ paths

  /** Resolve `path` against `cwd` (both '/'-rooted inside the session),
    * mirroring the reference's extended-path construction
    * (`src/oph_filters.c:586-601`). */
  def resolve(path: String, cwd: String = "/"): String = {
    val p = path.trim
    val joined =
      if (p.startsWith("/")) p
      else if (cwd.endsWith("/")) cwd + p
      else s"$cwd/$p"
    val parts = joined.split("/").filter(_.nonEmpty)
    val stack = mutable.ArrayBuffer[String]()
    parts.foreach {
      case "."  =>
      case ".." => if (stack.nonEmpty) stack.remove(stack.length - 1)
      case seg  => stack += seg
    }
    root + stack.map("/" + _).mkString
  }

  // -------------------------------------------------------- folders

  def mkdir(path: String, cwd: String = "/"): String = synchronized {
    val full = resolve(path, cwd)
    val segs = full.stripPrefix(root).split("/").filter(_.nonEmpty)
    var cur = root
    segs.foreach { s => cur = s"$cur/$s"; folders += cur }
    full
  }

  def rmdir(path: String, cwd: String = "/"): Unit = synchronized {
    val full = resolve(path, cwd)
    require(full != root, "cannot remove the session root")
    require(!folders.exists(f => f != full && f.startsWith(full + "/")),
      s"folder not empty: $full")
    require(!containers.values.exists(_.folder == full),
      s"folder holds containers: $full")
    folders -= full
  }

  def mv(from: String, to: String, cwd: String = "/"): Unit = synchronized {
    val src = resolve(from, cwd); val dst = resolve(to, cwd)
    require(folders.contains(src), s"no such folder: $src")
    val moved = folders.filter(f => f == src || f.startsWith(src + "/")).toSeq
    folders --= moved
    folders ++= moved.map(f => dst + f.stripPrefix(src))
    containers.mapValuesInPlace { (_, c) =>
      if (c.folder == src || c.folder.startsWith(src + "/"))
        c.copy(folder = dst + c.folder.stripPrefix(src))
      else c
    }
    folders += dst
  }

  def listFolders(path: String = "/", cwd: String = "/",
      recursive: Boolean = false): Seq[String] = synchronized {
    val full = resolve(path, cwd)
    folders.toSeq.sorted.filter { f =>
      if (recursive) f.startsWith(full)
      else f == full || (f.startsWith(full + "/") &&
        !f.stripPrefix(full + "/").contains("/"))
    }
  }

  // ------------------------------------------------------ containers

  def createContainer(name: String, path: String = "/",
      cwd: String = "/"): Container = synchronized {
    val folder = mkdir(path, cwd)
    require(!containers.values.exists(c =>
      c.folder == folder && c.name == name),
      s"container exists: $folder/$name")
    nextContainerId += 1
    val c = Container(nextContainerId, name, folder)
    containers(c.id) = c
    c
  }

  /** Delete = move to trash (restorable); `force` drops cubes too. */
  def deleteContainer(name: String, path: String = "/", cwd: String = "/",
      force: Boolean = false): Unit = synchronized {
    val folder = resolve(path, cwd)
    val c = containers.values.find(x => x.folder == folder && x.name == name)
      .getOrElse(throw new NoSuchElementException(s"container $folder/$name"))
    val held = cubes.values.count(_.containerId == c.id)
    if (held > 0 && !force)
      throw new IllegalStateException(s"container $name holds $held cubes")
    if (force) cubes.filterInPlace((_, e) => e.containerId != c.id)
    containers -= c.id
    trash(c.id) = c
  }

  /** Move (and optionally rename) a container to another folder —
    * oph_movecontainer (`src/oph_json/oph_json_objkeys.h:127`). The
    * container keeps its numeric id, so cube PIDs — which embed the
    * container id (`src/oph_massive_operations.c:346` builds
    * `{web_server}/{id_container}/{id_datacube}`) — remain addressable
    * after the move. `dest` naming an EXISTING folder moves the
    * container into it under its current name; otherwise dest's last
    * segment is the new name and its parent must already exist. */
  def moveContainer(src: String, dest: String,
      cwd: String = "/"): Container = synchronized {
    val srcFull = resolve(src, cwd)
    val slash = srcFull.lastIndexOf('/')
    val (srcFolder, srcName) = (srcFull.take(slash), srcFull.drop(slash + 1))
    val c = containers.values
      .find(x => x.folder == srcFolder && x.name == srcName)
      .getOrElse(throw new NoSuchElementException(s"container $srcFull"))
    val destFull = resolve(dest, cwd)
    val (dFolder, dName) =
      if (folders.contains(destFull)) (destFull, srcName)
      else {
        val ds = destFull.lastIndexOf('/')
        (destFull.take(ds), destFull.drop(ds + 1))
      }
    require(folders.contains(dFolder), s"no such folder: $dFolder")
    require(!containers.values.exists(x =>
      x.id != c.id && x.folder == dFolder && x.name == dName),
      s"container exists: $dFolder/$dName")
    val moved = c.copy(folder = dFolder, name = dName)
    containers(c.id) = moved
    moved
  }

  def restoreContainer(name: String): Container = synchronized {
    val c = trash.values.find(_.name == name)
      .getOrElse(throw new NoSuchElementException(s"not in trash: $name"))
    trash -= c.id
    containers(c.id) = c
    c
  }

  def container(id: Long): Option[Container] = synchronized(containers.get(id))

  def findContainer(name: String, path: String = "/",
      cwd: String = "/"): Option[Container] = synchronized {
    val folder = resolve(path, cwd)
    containers.values.find(c => c.name == name && c.folder == folder)
  }

  /** Atomic find-or-create — parallel workflow branches race on the
    * same new container name; a non-atomic find+create throws in the
    * loser thread. */
  def getOrCreateContainer(name: String, path: String = "/",
      cwd: String = "/"): Container = synchronized {
    findContainer(name, path, cwd).getOrElse(createContainer(name, path, cwd))
  }

  // ----------------------------------------------------------- cubes

  def addCube(containerId: Long, measure: String, level: Int = 0,
      metadata: Map[String, String] = Map.empty,
      parents: Seq[Long] = Seq.empty,
      sourceTask: Option[String] = None): Entry = synchronized {
    require(containers.contains(containerId), s"no container $containerId")
    nextCubeId += 1
    val e = Entry(nextCubeId, containerId, measure, level, metadata,
      parents, sourceTask)
    cubes(e.id) = e
    e
  }

  def deleteCube(id: Long): Unit = synchronized { cubes -= id }

  def cube(id: Long): Option[Entry] = synchronized(cubes.get(id))

  def allCubes: Seq[Entry] = synchronized(cubes.values.toSeq)

  /** oph_metadata CRUD (`oph_json_objkeys.h:132-133`). */
  def setMetadata(id: Long, key: String, value: String): Unit = synchronized {
    cubes.get(id).foreach(e =>
      cubes(id) = e.copy(metadata = e.metadata + (key -> value)))
  }

  def dropMetadata(id: Long, key: String): Unit = synchronized {
    cubes.get(id).foreach(e => cubes(id) = e.copy(metadata = e.metadata - key))
  }

  // --------------------------------------------- listing / provenance

  /** oph_list-style listing: cubes in a folder (subtree if recursive,
    * optionally depth-bounded relative to the listed folder). */
  def listCubes(path: String = "/", cwd: String = "/",
      recursive: Boolean = false, depth: Int = 0): Seq[Entry] = synchronized {
    val full = resolve(path, cwd)
    def within(folder: String): Boolean =
      if (!recursive) folder == full
      else (folder == full || folder.startsWith(full + "/")) &&
        (depth <= 0 ||
          folder.stripPrefix(full).count(_ == '/') <= depth)
    cubes.values.toSeq.filter(e =>
      containers.get(e.containerId).exists(c => within(c.folder)))
  }

  /** oph_search: metadata/measure filters over a subtree
    * (`oph_json_objkeys.h:112-113`). */
  def search(path: String = "/", cwd: String = "/",
      measure: Option[String] = None,
      metadataKey: Option[String] = None,
      metadataValue: Option[String] = None): Seq[Entry] = synchronized {
    listCubes(path, cwd, recursive = true).filter { e =>
      measure.forall(_ == e.measure) &&
      metadataKey.forall(e.metadata.contains) &&
      metadataValue.forall(v => e.metadata.values.exists(
        _.toLowerCase.contains(v.toLowerCase)))
    }
  }

  /** oph_cubeio provenance edges: (parent id, child id) pairs reachable
    * from `id` in both directions (`oph_json_objkeys.h:38-39`). */
  def provenance(id: Long): Seq[(Long, Long)] = synchronized {
    val edges = cubes.values.flatMap(e => e.parents.map(p => (p, e.id))).toSeq
    val up = mutable.Set[Long](); val down = mutable.Set[Long]()
    def walkUp(i: Long): Unit =
      if (up.add(i)) edges.filter(_._2 == i).map(_._1).foreach(walkUp)
    def walkDown(i: Long): Unit =
      if (down.add(i)) edges.filter(_._1 == i).map(_._2).foreach(walkDown)
    walkUp(id); walkDown(id)
    val keep = up ++ down
    edges.filter(e => keep.contains(e._1) && keep.contains(e._2))
  }

  def folderOf(e: Entry): String =
    synchronized(containers.get(e.containerId).map(_.folder).getOrElse(""))

  def containerNameOf(e: Entry): String =
    synchronized(containers.get(e.containerId).map(_.name).getOrElse(""))
}
