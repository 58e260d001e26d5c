package graft.workflow

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/**
 * Workflow model + JSON parsing + validation — the server-native layer
 * the reference implements in full C:
 *  - request fields (`/root/reference/src/oph_workflow/
 *    oph_workflow_parsing.c:91-298`),
 *  - dependency model (`oph_workflow_structs.h:83-209`),
 *  - topological-sort DAG validation, rejecting cycles
 *    (`oph_workflow_setup.c:200-288`),
 *  - flow-control block nesting checks (`oph_workflow_setup.c:523+`).
 */
object Workflow {

  /** Full dependency surface (`oph_workflow_structs.h:83-102`):
    * `argument`/`order` name the dependent-task slot the harvested
    * output lands in; `outputArgument`/`outputOrder` name which output
    * of the producer to harvest; `depType` all|single|embedded. */
  final case class Dependency(
      task: String,
      argument: Option[String] = None,
      depType: String = "embedded", // all | single | embedded
      order: Int = 0,
      filter: String = "all",
      outputArgument: String = "cube",
      outputOrder: Int = 0)

  final case class Task(
      name: String,
      operator: String,
      arguments: Map[String, String] = Map.empty,
      dependencies: Seq[Dependency] = Seq.empty,
      onError: String = "abort", // nop|skip|continue|break|repeat|abort
      run: Boolean = true,
      onExit: String = "nop") // nop|oph_delete|oph_deletecontainer

  final case class Spec(
      name: String,
      author: String = "",
      abstractText: String = "",
      sessionId: Option[String] = None,
      execMode: String = "sync", // sync | async
      cwd: String = "/",
      cube: Option[String] = None,
      onError: String = "abort",
      onExit: String = "nop",
      checkpoint: Option[String] = None,   // `oph_workflow_parsing.c:283-290`
      /** classic | compact | extended | extended_compact
        * (`oph_workflow_parsing.c:291-305`): `compact` collapses the
        * per-task texts, `extended` adds the task-list grid; the
        * combination does both. Any other value is a parse error like
        * the reference's BAD_PARAM. */
      outputFormat: String = "classic",
      /** Completion push target (`oph_workflow_parsing.c:91-95`,
        * fired at `oph_workflow_engine.c:6768-6818`): on workflow
        * completion the server calls back with jobid + status. */
      callbackUrl: Option[String] = None,
      ncores: Option[Int] = None,
      /** Per-task thread hint (`oph_workflow_parsing.c:91-95` nthreads)
        * — surfaces as the NTHREADS builtin variable. */
      nthreads: Option[Int] = None,
      /** Current data directory: relative src_path/output_path values
        * resolve against it (`oph_workflow_parsing.c:91-95` cdd). */
      cdd: String = "/",
      /** Accounting tag forwarded with the run (reference `project`,
        * resource-manager accounting). */
      project: Option[String] = None,
      /** save=no skips recording the request/response in the session
        * store (`oph_workflow_parsing.c:270-290`). */
      save: Boolean = true,
      directOutput: Boolean = false,
      url: Option[String] = None,
      nhosts: Option[Int] = None,
      hostPartition: Option[String] = None,
      variables: Map[String, String] = Map.empty,
      tasks: Seq[Task] = Seq.empty)

  final class ValidationError(msg: String) extends Exception(msg)

  private val mapper = new ObjectMapper()

  /** Parse a JSON request into a Spec (jansson → Jackson). */
  def parse(json: String): Spec = {
    val n = mapper.readTree(json)
    // a JSON null is ABSENT (NullNode.asText would yield "null")
    def opt(node: JsonNode, field: String): Option[JsonNode] =
      Option(node.get(field)).filterNot(_.isNull)
    def str(node: JsonNode, field: String, dflt: String): String =
      opt(node, field).map(_.asText).getOrElse(dflt)
    val wfOnError = str(n, "on_error", "abort")
    val wfOnExit = str(n, "on_exit", "nop")
    val tasks = Option(n.get("tasks")).map(_.elements.asScala.toSeq)
      .getOrElse(Seq.empty).map { tn =>
        val args = Option(tn.get("arguments"))
          .map(_.elements.asScala.toSeq).getOrElse(Seq.empty)
          .map { an =>
            // reject malformed pairs like the reference parser — a
            // silently-dropped argument runs the operator with defaults
            an.asText.split("=", 2) match {
              case Array(k, v) => k -> v
              case _ => throw new ValidationError(
                s"malformed argument '${an.asText}' (expected key=value)")
            }
          }.toMap
        val deps = Option(tn.get("dependencies"))
          .map(_.elements.asScala.toSeq).getOrElse(Seq.empty)
          .map { dn =>
            Dependency(str(dn, "task", ""),
              Option(dn.get("argument")).filterNot(_.isNull).map(_.asText),
              // reference default: argument present => "all", else
              // "embedded" (`oph_workflow_parsing.c:592-596`)
              str(dn, "type",
                if (dn.has("argument")) "all" else "embedded"),
              order = str(dn, "order", "0").toInt,
              filter = str(dn, "filter", "all"),
              outputArgument = str(dn, "output_argument", "cube"),
              outputOrder = str(dn, "output_order", "0").toInt)
          }
        Task(str(tn, "name", ""), str(tn, "operator", ""), args, deps,
          str(tn, "on_error", wfOnError),
          !str(tn, "run", "yes").equalsIgnoreCase("no"),
          onExit = str(tn, "on_exit", wfOnExit))
      }
    val vars = Option(n.get("variables")).map { vn =>
      vn.properties.asScala.map(e => e.getKey -> e.getValue.asText).toMap
    }.getOrElse(Map.empty[String, String])
    Spec(
      name = str(n, "name", "workflow"),
      author = str(n, "author", ""),
      abstractText = str(n, "abstract", ""),
      sessionId = opt(n, "sessionid").map(_.asText),
      execMode = str(n, "exec_mode", "sync"),
      cwd = str(n, "cwd", "/"),
      cube = opt(n, "cube").map(_.asText),
      onError = wfOnError,
      onExit = wfOnExit,
      checkpoint = opt(n, "checkpoint").map(_.asText),
      outputFormat = {
        val of = str(n, "output_format", "classic")
        if (!Set("classic", "compact", "extended", "extended_compact")
          .contains(of.toLowerCase))
          throw new ValidationError(s"error in parsing parameter " +
            s"'output_format' (got '$of')")
        of.toLowerCase
      },
      callbackUrl = opt(n, "callback_url").map(_.asText),
      ncores = opt(n, "ncores").map(_.asText.toInt),
      nthreads = opt(n, "nthreads").map(_.asText.toInt),
      cdd = str(n, "cdd", "/"),
      project = opt(n, "project").map(_.asText),
      save = {
        val s = str(n, "save", "yes")
        if (!Set("yes", "no").contains(s.toLowerCase))
          throw new ValidationError(
            s"error in parsing parameter 'save' (got '$s')")
        !s.equalsIgnoreCase("no")
      },
      directOutput = str(n, "direct_output", "no").equalsIgnoreCase("yes"),
      url = opt(n, "url").map(_.asText),
      nhosts = opt(n, "nhost").map(_.asText.toInt),
      hostPartition = opt(n, "host_partition").map(_.asText),
      variables = vars,
      tasks = tasks)
  }

  private val flowOps = Set("oph_for", "oph_endfor", "oph_if", "oph_elseif",
    "oph_else", "oph_endif")

  /**
   * Reorder data tasks into dependency order within each maximal run of
   * consecutive non-flow-control tasks. The reference schedules by
   * readiness, so a valid DAG may list a dependent before its producer
   * (`oph_workflow_execute`); our executor walks the list positionally,
   * so each segment is stably topo-sorted first. Flow-control markers
   * stay put — their blocks are positional by definition.
   */
  def reorderSegments(spec: Spec): Spec = {
    val byName = spec.tasks.zipWithIndex.map { case (t, i) => t.name -> i }.toMap
    def sortSegment(seg: Seq[Task]): Seq[Task] = {
      if (seg.size < 2) return seg
      val segIdx = seg.map(t => byName(t.name)).toSet
      // stable Kahn: among ready tasks, keep original listing order
      val pending = scala.collection.mutable.ArrayBuffer(seg: _*)
      val done = scala.collection.mutable.Set[String]()
      val out = Seq.newBuilder[Task]
      var progress = true
      while (pending.nonEmpty && progress) {
        progress = false
        val i = pending.indexWhere(t => t.dependencies.forall(d =>
          !segIdx.contains(byName.getOrElse(d.task, -1)) || done(d.task)))
        if (i >= 0) {
          val t = pending.remove(i)
          done += t.name
          out += t
          progress = true
        }
      }
      out ++= pending // cycle within segment: validate() rejects it anyway
      out.result()
    }
    val tasks = Seq.newBuilder[Task]
    val seg = scala.collection.mutable.ArrayBuffer[Task]()
    spec.tasks.foreach { t =>
      if (flowOps.contains(t.operator.toLowerCase)) {
        tasks ++= sortSegment(seg.toSeq); seg.clear()
        tasks += t
      } else seg += t
    }
    tasks ++= sortSegment(seg.toSeq)
    spec.copy(tasks = tasks.result())
  }

  /** Resolve dependency names to indices (oph_workflow_indexing). */
  def index(spec: Spec): Map[Int, Seq[Int]] = {
    val byName = spec.tasks.zipWithIndex.map { case (t, i) => t.name -> i }.toMap
    if (byName.size != spec.tasks.size)
      throw new ValidationError("duplicate task names")
    spec.tasks.zipWithIndex.map { case (t, i) =>
      i -> t.dependencies.map(d => byName.getOrElse(d.task,
        throw new ValidationError(s"task '${t.name}' depends on unknown task '${d.task}'")))
    }.toMap
  }

  /**
   * Kahn topological sort, rejecting cycles — the literal algorithm the
   * reference implements (`oph_workflow_setup.c:200-288`). Returns the
   * topo order.
   */
  def validate(spec: Spec): Seq[Int] = {
    val deps = index(spec)
    val n = spec.tasks.size
    val inDeg = Array.tabulate(n)(i => deps(i).size)
    val out = Array.fill(n)(Seq.empty[Int])
    deps.foreach { case (m, ds) => ds.foreach(d => out(d) = out(d) :+ m) }
    val s = scala.collection.mutable.Queue(
      (0 until n).filter(inDeg(_) == 0): _*)
    val order = Seq.newBuilder[Int]
    var visited = 0
    while (s.nonEmpty) {
      val node = s.dequeue()
      order += node
      visited += 1
      out(node).foreach { m =>
        inDeg(m) -= 1
        if (inDeg(m) == 0) s.enqueue(m)
      }
    }
    if (visited != n)
      throw new ValidationError("graph is not a DAG (cycle detected)")
    validateFlowBlocks(spec)
    // argument-descriptor validation (the reference's task parser
    // layer): unknown keys, missing mandatory, literal value domains
    spec.tasks.foreach { t =>
      try ArgSpecs.validate(t.operator, t.arguments,
        hasDeps = t.dependencies.nonEmpty || spec.cube.nonEmpty)
      catch {
        case e: ArgSpecs.ArgError =>
          throw new ValidationError(s"task '${t.name}': ${e.getMessage}")
      }
    }
    order.result()
  }

  /** Flow-control nesting check (oph_workflow_validate_fco): for/endfor
    * and if/elseif/else/endif must nest like brackets. */
  def validateFlowBlocks(spec: Spec): Unit = {
    val stack = scala.collection.mutable.Stack[String]()
    spec.tasks.foreach { t =>
      t.operator.toLowerCase match {
        case "oph_for" => stack.push("for")
        case "oph_if" => stack.push("if")
        case "oph_endfor" =>
          if (stack.isEmpty || stack.pop() != "for")
            throw new ValidationError("oph_endfor without matching oph_for")
        case "oph_elseif" | "oph_else" =>
          if (stack.isEmpty || stack.top != "if")
            throw new ValidationError(s"${t.operator} outside oph_if block")
        case "oph_endif" =>
          if (stack.isEmpty || stack.pop() != "if")
            throw new ValidationError("oph_endif without matching oph_if")
        case _ =>
      }
    }
    if (stack.nonEmpty)
      throw new ValidationError(s"unclosed flow-control block: ${stack.top}")
  }

  /** One workflow variable with its defining task (caller), for the
    * ancestry-scoped visibility rule (`oph_workflow_utils.c:183-186`). */
  final case class Var(value: String, caller: Int = -1)

  /**
   * Variable substitution — `@var`, `@{var}`, index form `&var`, and
   * builtins (port of `oph_workflow_utils.c:104-272`; prefixes
   * `oph_workflow_define.h:35-40`, builtins `:88-92`).
   *
   * `vars` are the visible variables (already scope-filtered by the
   * caller); `builtins` carry OPH_SESSION_ID & co.
   */
  def substitute(s: String, vars: Map[String, Var],
      builtins: Map[String, String] = Map.empty): String = {
    val out = new StringBuilder
    var i = 0
    def isNameChar(c: Char, first: Boolean): Boolean =
      c == '_' || c.isLetter || (!first && c.isDigit)
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c == '@' || c == '&') && i + 1 < s.length) {
        val braced = s.charAt(i + 1) == '{'
        val start = i + (if (braced) 2 else 1)
        var j = start
        while (j < s.length && (if (braced) s.charAt(j) != '}'
               else isNameChar(s.charAt(j), j == start))) j += 1
        val key = s.substring(start, j)
        if (braced && (j >= s.length || s.charAt(j) != '}'))
          throw new ValidationError(s"unclosed @{ in '$s'")
        val resolved =
          if (key.isEmpty) None
          else if (c == '&')
            // index form: the engine stores the loop counter's 1-based
            // position under "<key>&"; fall back to the value itself
            vars.get(key + "&").orElse(vars.get(key)).map(_.value)
          else builtins.get(key).orElse(vars.get(key).map(_.value))
        resolved match {
          case Some(v) => out ++= v; i = j + (if (braced) 1 else 0)
          case None => out += c; i += 1 // leave unknown refs untouched
        }
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /**
   * Arithmetic/logical condition evaluator for oph_if — the reference
   * delegates to GNU libmatheval with no free variables
   * (`oph_flow_control_operators.c:592-628`); this is a small
   * recursive-descent equivalent over doubles: numbers, + - * / %,
   * comparisons, ! && ||, parentheses. Non-zero => true. An empty
   * condition is TRUE (reference if_impl case 0) and a non-finite
   * result (0/0, 1/0) is the reference's "Wrong condition" error.
   */
  def evalCondition(expr: String): Double = {
    if (expr.trim.isEmpty) return 1.0
    val v = new CondParser(expr).parse()
    if (v.isNaN || v.isInfinite)
      throw new ValidationError(s"wrong condition '$expr'")
    v
  }

  private final class CondParser(s: String) {
    private var pos = 0
    private def ws(): Unit = while (pos < s.length && s.charAt(pos) == ' ') pos += 1
    private def peek: Char = if (pos < s.length) s.charAt(pos) else '\u0000'
    private def eat(c: Char): Unit = {
      ws(); if (peek != c) fail(s"expected '$c'"); pos += 1
    }
    private def fail(msg: String) =
      throw new ValidationError(s"condition error at $pos in '$s': $msg")

    def parse(): Double = {
      val v = orExpr(); ws()
      if (pos != s.length) fail("trailing input")
      v
    }
    private def orExpr(): Double = {
      var v = andExpr(); ws()
      while (pos + 1 < s.length && s.startsWith("||", pos)) {
        pos += 2; val r = andExpr(); v = if (v != 0 || r != 0) 1 else 0; ws()
      }
      v
    }
    private def andExpr(): Double = {
      var v = cmpExpr(); ws()
      while (pos + 1 < s.length && s.startsWith("&&", pos)) {
        pos += 2; val r = cmpExpr(); v = if (v != 0 && r != 0) 1 else 0; ws()
      }
      v
    }
    private def cmpExpr(): Double = {
      val l = addExpr(); ws()
      val ops = Seq(">=", "<=", "==", "!=", ">", "<")
      ops.find(op => s.startsWith(op, pos)) match {
        case Some(op) =>
          pos += op.length
          val r = addExpr()
          val b = op match {
            case ">=" => l >= r; case "<=" => l <= r; case "==" => l == r
            case "!=" => l != r; case ">" => l > r; case "<" => l < r
          }
          if (b) 1 else 0
        case None => l
      }
    }
    private def addExpr(): Double = {
      var v = mulExpr(); ws()
      while (peek == '+' || peek == '-') {
        val op = peek; pos += 1
        val r = mulExpr()
        v = if (op == '+') v + r else v - r; ws()
      }
      v
    }
    private def mulExpr(): Double = {
      var v = unary(); ws()
      while (peek == '*' || peek == '/' || peek == '%') {
        val op = peek; pos += 1
        val r = unary()
        v = op match {
          case '*' => v * r
          case '/' => v / r
          case '%' => v % r
        }
        ws()
      }
      v
    }
    private def unary(): Double = {
      ws()
      if (peek == '!') { pos += 1; if (unary() == 0) 1 else 0 }
      else if (peek == '-') { pos += 1; -unary() }
      else if (peek == '(') { eat('('); val v = orExpr(); eat(')'); v }
      else {
        ws()
        val start = pos
        while (pos < s.length &&
          (s.charAt(pos).isDigit || s.charAt(pos) == '.')) pos += 1
        if (pos == start) fail("expected number")
        s.substring(start, pos).toDouble
      }
    }
  }
}
