package graft.core

/**
 * OPH_MASSIVE filter grammar — the fan-out selector that expands one
 * task over many cubes (`/root/reference/src/oph_filters.c:557-725`,
 * grammar surface `etc/xml/OPH_MASSIVE_operator_1.0.xml:41-56`, task
 * expansion `src/oph_workflow_engine.c:843-1079`).
 *
 * Where the reference compiles to OphidiaDB SQL, here each clause
 * compiles to a Scala predicate over catalog entries — same semantics,
 * no SQL string: the catalog is driver-side metadata.
 *
 * Grammar:
 *   value      := group ('|' group)*          (top-level split outside [])
 *   group      := '[' clauses ']' | pid       (bare pid => explicit cube,
 *                                              NOT massive — engine.c:956)
 *   clauses    := clause (';' clause)*
 *   clause     := key '=' v | key '!=' v | bare  (bare => cube_filter)
 *   keys       := level, measure, parent_cube, container, container_pid,
 *                 cube_filter (subset string on cube id), metadata_key,
 *                 metadata_value (LIKE, needs metadata_key), path,
 *                 recursive, depth, run; '[*]'/'[all]'/'[]' select all
 *   multi      := 'a|b' within level/measure/container/metadata values
 */
object MassiveFilter {

  final case class Group(filters: Map[String, String])
  final case class Spec(groups: Seq[Group], explicitPids: Seq[String]) {
    /** `run=no` anywhere => list-only mode (engine.c:1058-1065). */
    def runEnabled: Boolean =
      !groups.exists(_.filters.get("run").exists(_.equalsIgnoreCase("no")))
  }

  final class FilterError(msg: String) extends Exception(msg)

  /** Split on `sep` outside square brackets. */
  /** Split on `sep` OUTSIDE brackets, trimming parts — shared with the
    * workflow engine's oph_for src_path list handling. */
  private[graft] def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '[' => depth += 1; cur += '['
      case ']' => depth -= 1; cur += ']'
      case c if c == sep && depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  def parse(value: String): Spec = {
    val tokens = splitTop(value, '|')
    val (groupToks, pidToks) = tokens.partition(t =>
      t.startsWith("[") && t.endsWith("]"))
    val groups = groupToks.map { g =>
      val inner = g.substring(1, g.length - 1).trim
      if (inner.isEmpty || inner == "*" || inner.equalsIgnoreCase("all"))
        Group(Map.empty)
      else {
        val kvs = inner.split(";").map(_.trim).filter(_.nonEmpty).map { cl =>
          cl.split("=", 2) match {
            case Array(k, v) => k.trim -> v.trim
            case Array(bare) => "cube_filter" -> bare.trim // `[10]` form
          }
        }
        Group(kvs.toMap)
      }
    }
    Spec(groups, pidToks)
  }

  /** graft-visible for XmlDescriptorGoldenSpec: the key set must match
    * the reference `OPH_MASSIVE_operator_1.0.xml` argument list. */
  private[graft] val knownKeys = Set("level", "measure", "parent_cube", "container",
    "container_pid", "cube_filter", "metadata_key", "metadata_value",
    "path", "recursive", "depth", "file", "convention", "run")

  /** Compile one group to a predicate over catalog entries.
    * `cwd` scopes the path filter exactly like the reference scopes to
    * the session folder (`oph_filters.c:576-621`). */
  def compile(g: Group, catalog: Catalog, cwd: String = "/"): Catalog.Entry => Boolean = {
    type E = Catalog.Entry
    g.filters.keys.foreach { k =>
      val base = k.stripSuffix("!")
      if (!knownKeys.contains(base)) throw new FilterError(s"unknown filter '$k'")
    }
    // metadata negation conflict rule (`oph_filters.c:689-704`)
    if (g.filters.contains("metadata_key!") &&
        (g.filters.contains("metadata_value") ||
         g.filters.contains("metadata_value!")))
      throw new FilterError(
        "metadata_key! cannot be used when metadata_value is set")
    if (!g.filters.contains("metadata_key") &&
        g.filters.contains("metadata_value"))
      throw new FilterError("metadata_value requires metadata_key")

    val preds = Seq.newBuilder[(E => Boolean, Boolean)] // (pred, negated)

    def multi(v: String): Seq[String] = v.split('|').map(_.trim).toSeq

    def add(key: String)(mk: String => E => Boolean): Unit = {
      g.filters.get(key).foreach(v => preds += ((mk(v), false)))
      g.filters.get(key + "!").foreach(v => preds += ((mk(v), true)))
    }

    /** A malformed filter VALUE is a FilterError, never a stray
      * NumberFormatException — the reference's oph_filter_* functions
      * return an error code for every malformed input
      * (`test/oph_server_test.c:3815+` edge cases). */
    def bad(key: String, v: String): Nothing =
      throw new FilterError(s"malformed value '$v' for filter '$key'")

    /** PID tail: the numeric id after the last '/' — `wrong`,
      * `http://localhostwrong`, `http://localhost/` all fail like the
      * reference's oph_filter_parent checks. */
    def pidTail(key: String, v: String): Long = {
      val tail = v.split("/").lastOption.getOrElse("")
      tail.toLongOption.getOrElse(bad(key, v))
    }

    add("level") { v =>
      // '|' and ',' both separate level lists (the reference golden
      // `[level=1,3]` form, `test/oph_server_test.c:2430`)
      val ls = v.split("[|,]").map(_.trim).filter(_.nonEmpty)
        .map(x => x.toIntOption.getOrElse(bad("level", v))).toSet
      e => ls.contains(e.level) }
    add("measure") { v => val ms = multi(v).toSet
      e => ms.contains(e.measure) }
    add("container") { v => val cs = multi(v).toSet
      e => cs.contains(catalog.containerNameOf(e)) }
    add("container_pid") { v =>
      val id = pidTail("container_pid", v)
      e => e.containerId == id }
    add("cube_filter") { v =>
      // subset string on the cube id, `end` = max current id
      val max = catalog.allCubes.map(_.id).maxOption
      val spec =
        try Subset.parse(v, max)
        catch { case _: Exception => bad("cube_filter", v) }
      e => spec.contains(e.id) }
    add("parent_cube") { v =>
      val id = pidTail("parent_cube", v)
      e => e.parents.contains(id) }
    // file= glob matches the BASENAME of the cube's source file
    // (`oph_massive_operations.c:211-214` file clause); convention=
    // accepts only the cmip5 layout — anything else is an error, never
    // a silent select-all
    add("file") { v =>
      val res = multi(v).map(globRegex)
      e => e.metadata.get("source").exists { s =>
        val base = s.split('/').last
        res.exists(_.matches(base))
      }
    }
    g.filters.get("convention").foreach { v =>
      if (!v.equalsIgnoreCase("cmip5"))
        throw new FilterError(s"unknown convention '$v'")
      preds += ((e => e.metadata.get("source").exists(s =>
        isCmip5(s.split('/').last)), false))
    }
    add("metadata_key") { v => val keys = multi(v)
      g.filters.get("metadata_value") match {
        case Some(mv) =>
          // pairwise key->LIKE-value match (`oph_filters.c:345-363`)
          val vals = multi(mv)
          e => keys.zipWithIndex.forall { case (k, i) =>
            e.metadata.get(k).exists(x => i >= vals.length ||
              x.toLowerCase.contains(vals(i).toLowerCase)) }
        case None =>
          e => keys.forall(e.metadata.contains)
      } }
    // The path scope is ALWAYS applied, defaulting to cwd — every
    // reference query carries the folder clause (`oph_filters.c:679`,
    // golden SQL `test/oph_server_test.c:2440-2455` all end with
    // `container.idfolder=...`).
    def pathPred(v: String): E => Boolean = {
      val full = catalog.resolve(v, cwd)
      val recursive = g.filters.get("recursive").exists(_.equalsIgnoreCase("yes"))
      val depth = g.filters.get("depth")
        .map(d => d.toIntOption.getOrElse(bad("depth", d))).getOrElse(0)
      e => {
        val f = catalog.folderOf(e)
        if (recursive)
          (f == full || f.startsWith(full + "/")) &&
            (depth <= 0 || f.stripPrefix(full).count(_ == '/') <= depth)
        else f == full
      }
    }
    preds += ((pathPred(g.filters.getOrElse("path", cwd)), false))
    g.filters.get("path!").foreach(v => preds += ((pathPred(v), true)))

    val built = preds.result()
    e => built.forall { case (p, neg) => if (neg) !p(e) else p(e) }
  }

  /** Expand a massive filter to the matching cubes (the light-task
    * fan-out list). `[run=no]` callers can use the same list as a
    * preview. Explicit (bare) pids resolve directly without filtering
    * — they are not massive (`oph_workflow_engine.c:956-962`). */
  def expand(value: String, catalog: Catalog, cwd: String = "/"): Seq[Catalog.Entry] = {
    val spec = parse(value)
    val fromGroups = spec.groups.flatMap(g =>
      catalog.allCubes.filter(compile(g, catalog, cwd)))
    val fromPids = spec.explicitPids.flatMap(p =>
      catalog.cube(p.split("/").last.toLong))
    (fromGroups ++ fromPids).distinctBy(_.id)
  }

  /** Glob to anchored regex: `*`/`?` wildcards plus shell brace
    * alternation `{a,b}` (the reference's file filters go through its
    * FS service's shell-style matching — `file={nofile}` in
    * `test/oph_server_test.c:2828` is a one-alternative brace set,
    * not a literal). */
  private def globRegex(glob: String): scala.util.matching.Regex = {
    // brace alternation only applies to BALANCED, non-nested sets —
    // an unbalanced '{' is a literal character like the shell treats
    // it (and must never escape as a raw PatternSyntaxException)
    val braced = {
      var depth = 0
      var ok = true
      glob.foreach {
        case '{' => depth += 1; if (depth > 1) ok = false
        case '}' => depth -= 1; if (depth < 0) ok = false
        case _ =>
      }
      ok && depth == 0 && glob.contains('{')
    }
    val sb = new StringBuilder
    var inBrace = false
    glob.foreach {
      case '*' => sb ++= ".*"
      case '?' => sb += '.'
      case '{' if braced && !inBrace => inBrace = true; sb += '('
      case '}' if braced && inBrace => inBrace = false; sb += ')'
      case ',' if inBrace => sb += '|'
      case c if "\\.[](){}+-^$|".contains(c) => sb ++= s"\\$c"
      case c => sb += c
    }
    sb.toString.r
  }

  private def hasGlob(s: String): Boolean =
    s.exists(c => c == '*' || c == '?' || c == '{')

  /** CMIP5 DRS filename: `var_table_model_experiment_ensemble[_time].ext`
    * — at least 5 '_'-separated fields (the reference's
    * `convention=cmip5` file harvesting, `oph_massive_operations.c`). */
  private def isCmip5(basename: String): Boolean =
    basename.takeWhile(_ != '.').split('_').count(_.nonEmpty) >= 5

  /**
   * Massive SRC_PATH fan-out (`oph_massive_operations.c:196-320`): a
   * `[path=...;file=...;recursive=yes;depth=n;convention=cmip5]` value
   * expands to the matching FILES on the local filesystem — one light
   * task (one import) per file. Driver-side directory walk: listing is
   * metadata work, exactly like the reference delegating to its FS
   * service; the heavy lifting (the reads) happens in the fanned-out
   * Spark jobs.
   */
  def expandFiles(value: String, cwd: String = "/",
      cdd: String = "/"): Seq[String] = {
    val spec = parse(value)
    // an unterminated/unopened group is a grammar error, never a
    // silent path passthrough (`test/oph_server_test.c:2832` "[wrong")
    spec.explicitPids.foreach { t =>
      if (t.startsWith("[") != t.endsWith("]"))
        throw new FilterError(s"malformed filter group '$t'")
    }
    val fromGroups = spec.groups.flatMap { g0 =>
      // src_path context: a BARE clause is the path argument — the
      // reference rewrites `[x]` to `[path=x]` before parsing
      // (`oph_massive_operations.c:76-116`); `parse` is shared with
      // the cube context where bare means cube_filter, so remap here
      val g = if (g0.filters.keySet == Set("cube_filter"))
        Group(Map("path" -> g0.filters("cube_filter")))
      else g0
      g.filters.keys.foreach { k =>
        if (!Set("path", "file", "recursive", "depth", "convention", "run",
            "measure", "cdd").contains(k))
          throw new FilterError(s"unknown src_path filter '$k'")
      }
      // path sanitation + cdd resolution, the reference's rules in
      // order (`oph_massive_operations.c:171-199`): no '..' anywhere,
      // no leading '~'; a RELATIVE path needs an absolute,
      // '..'-free cdd and resolves under it
      val rawPath = g.filters.getOrElse("path", cwd).trim
      if (rawPath.contains(".."))
        throw new FilterError(s"the use of '..' in '$rawPath' is forbidden")
      if (rawPath.startsWith("~"))
        throw new FilterError("src_path cannot begin with '~'")
      val path =
        if (rawPath.startsWith("/")) rawPath
        else {
          val cddTrim = Option(cdd).getOrElse("/").trim
          if (!cddTrim.startsWith("/"))
            throw new FilterError(s"cdd '$cddTrim' must begin with '/'")
          if (cddTrim.contains(".."))
            throw new FilterError(s"the use of '..' in cdd is forbidden")
          s"${cddTrim.stripSuffix("/")}/$rawPath"
        }
      // the path itself may carry globs (`[testdata/*.test]`):
      // expand segment-wise — matched FILES are sources directly,
      // matched DIRECTORIES are walk roots
      def expandPathGlobs(p: String): Seq[java.io.File] = {
        def rec(base: java.io.File, rest: List[String]): Seq[java.io.File] =
          rest match {
            case Nil => if (base.exists) Seq(base) else Seq.empty
            case seg :: tail if hasGlob(seg) =>
              val re = globRegex(seg)
              Option(base.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
                .filter(f => re.matches(f.getName))
                .sortBy(_.getName)
                .flatMap(f => rec(f, tail))
            case seg :: tail => rec(new java.io.File(base, seg), tail)
          }
        rec(new java.io.File("/"), p.split("/").filter(_.nonEmpty).toList)
      }
      val targets =
        if (hasGlob(path)) expandPathGlobs(path)
        else Seq(new java.io.File(path))
      if (!hasGlob(path) && !targets.head.isDirectory)
        throw new FilterError(s"src_path '$path' is not a directory")
      val recursive = g.filters.get("recursive").exists(_.equalsIgnoreCase("yes"))
      val depth = g.filters.get("depth").map(d => d.toIntOption.getOrElse(
        throw new FilterError(s"malformed value '$d' for filter 'depth'")))
        .getOrElse(0)
      val fileRes = g.filters.get("file")
        .map(v => v.split('|').toSeq.map(_.trim).filter(_.nonEmpty).map(globRegex))
        .getOrElse(Seq.empty)
      val wantCmip5 = g.filters.get("convention") match {
        case Some(v) if v.equalsIgnoreCase("cmip5") => true
        case Some(v) => throw new FilterError(s"unknown convention '$v'")
        case None => false
      }
      // a DIRECTORY is a leaf data source (not a folder to descend)
      // when it looks like one: a parquet/Spark output dir (_SUCCESS
      // marker or a data-file extension in its name) or a file-glob hit
      def isDataDir(f: java.io.File): Boolean =
        new java.io.File(f, "_SUCCESS").exists ||
          f.getName.matches(".*\\.(parquet|orc|csv|nc)$") ||
          (fileRes.nonEmpty && fileRes.exists(_.matches(f.getName)))
      def walk(dir: java.io.File, d: Int): Seq[java.io.File] = {
        val entries = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        entries.flatMap { f =>
          if (f.isFile) Seq(f)
          else if (isDataDir(f)) Seq(f)
          else if (recursive && (depth <= 0 || d < depth)) walk(f, d + 1)
          else Seq.empty
        }
      }
      targets.flatMap { t =>
        if (t.isFile || isDataDir(t)) Seq(t) // glob-matched leaf source
        else walk(t, 0)
      }
        .filter(f => fileRes.isEmpty || fileRes.exists(_.matches(f.getName)))
        .filter(f => !wantCmip5 || isCmip5(f.getName))
        .map(_.getPath).distinct.sorted
    }
    (fromGroups ++ spec.explicitPids).distinct
  }
}
