package graft.server

import scala.collection.mutable

/**
 * Session management service — oph_manage_session / oph_resume /
 * oph_log_info semantics (`/root/reference/src/oph_management_operators
 * .c:461-2100`, actions `src/oph_parser.h:189-203`; role model
 * `src/oph_auth.h:79-96`; saved-request store `oph_workflow_save`
 * `src/oph_workflow_engine.c:244-288`).
 *
 * Roles are the reference's bitmask: read=1, write=2, execute=4,
 * admin=8, owner=16; grantable names resolve to the composite masks
 * (write => writer = read+write, etc.). Rendered as the reference's
 * 5-flag string `rwxao` with '-' for absent bits.
 */
object SessionService {

  val RoleNone = 0
  val RoleRead = 1
  val RoleWrite = 2
  val RoleExecute = 4
  val RoleAdmin = 8
  val RoleOwner = 16
  val RoleWriter: Int = RoleRead + RoleWrite
  val RoleAdministrator: Int = RoleAdmin + RoleExecute + RoleWriter
  val RoleAll: Int = RoleOwner + RoleAdministrator

  def parseRole(s: String): Int = s.toLowerCase match {
    case "none" | "null" => RoleNone
    case "read" | "read_force" => RoleRead
    case "write" => RoleWriter
    case "execute" => RoleExecute + RoleWriter
    case "admin" => RoleAdministrator
    case "owner" => RoleAll
    case other => throw new IllegalArgumentException(s"unknown role '$other'")
  }

  def renderRole(mask: Int): String = {
    val flags = Seq(
      (RoleRead, 'r'), (RoleWrite, 'w'), (RoleExecute, 'x'),
      (RoleAdmin, 'a'), (RoleOwner, 'o'))
    flags.map { case (bit, c) => if ((mask & bit) != 0) c else '-' }.mkString
  }

  final case class SavedWorkflow(
      workflowId: Int,
      request: String,
      response: String)

  final case class Session(
      code: String,
      owner: String,
      var label: String = "",
      var active: Boolean = true,
      var autoremove: Boolean = false,
      roles: mutable.Map[String, Int] = mutable.Map.empty,
      workflows: mutable.ArrayBuffer[SavedWorkflow] = mutable.ArrayBuffer.empty)

  final class AuthError(msg: String) extends Exception(msg)
}

final class SessionService(
    /** Durable session table (the reference persists sessions in
      * OphidiaDB): codes, owners, roles, flags and saved workflow
      * documents survive a restart. None = memory only. */
    stateFile: Option[java.nio.file.Path] = None) {
  import SessionService._

  private val sessions = mutable.LinkedHashMap[String, Session]()
  private val logRing = mutable.ArrayDeque[String]()
  private val maxLog = 1000
  private var nextCode = 0

  // restore persisted sessions (the log ring is intentionally volatile)
  stateFile.flatMap(StateStore.load).foreach { text =>
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
    nextCode = Option(n.get("nextCode")).map(_.asInt).getOrElse(0)
    Option(n.get("sessions")).foreach(_.elements().forEachRemaining { sn =>
      val s = Session(
        sn.get("code").asText, sn.get("owner").asText,
        sn.get("label").asText, sn.get("active").asBoolean,
        sn.get("autoremove").asBoolean)
      Option(sn.get("roles")).foreach(_.properties().forEach(e =>
        s.roles(e.getKey) = e.getValue.asInt))
      Option(sn.get("workflows")).foreach(_.elements().forEachRemaining(w =>
        s.workflows += SavedWorkflow(w.get("id").asInt,
          w.get("request").asText, w.get("response").asText)))
      sessions(s.code) = s
    })
  }

  private def persist(): Unit = stateFile.foreach { p =>
    // an empty table DELETES the file: a lingering empty state file
    // would still read as "restorable" to the HTTP layer, letting a
    // later requester re-mint (and own) a removed session's code
    if (sessions.isEmpty) { StateStore.delete(p); return }
    def q(s: String): String = graft.render.ResponseWriter.jsonQuote(s)
    val body = sessions.values.map { s =>
      val roles = s.roles.map { case (u, m) => s"${q(u)}:$m" }.mkString(",")
      val wfs = s.workflows.map(w =>
        s"""{"id":${w.workflowId},"request":${q(w.request)},""" +
          s""""response":${q(w.response)}}""").mkString(",")
      s"""{"code":${q(s.code)},"owner":${q(s.owner)},"label":${q(s.label)},""" +
        s""""active":${s.active},"autoremove":${s.autoremove},""" +
        s""""roles":{$roles},"workflows":[$wfs]}"""
    }.mkString(",")
    StateStore.save(p, s"""{"nextCode":$nextCode,"sessions":[$body]}""")
  }

  // ------------------------------------------------------------- log

  def log(msg: String): Unit = synchronized {
    logRing.append(msg)
    if (logRing.size > maxLog) logRing.removeHead()
  }

  /** oph_log_info: last n lines of the engine log ring. */
  def tailLog(n: Int): Seq[String] = synchronized(logRing.takeRight(n).toSeq)

  // -------------------------------------------------------- sessions

  private def roleOf(s: Session, user: String): Int =
    if (s.owner == user) RoleAll else s.roles.getOrElse(user, RoleNone)

  /** Authorization check for the service layer: does `user` hold every
    * bit of `mask` on session `code`? Unknown sessions grant nothing. */
  def hasRole(code: String, user: String, mask: Int): Boolean = synchronized {
    sessions.get(code).exists(s => (roleOf(s, user) & mask) == mask)
  }

  /** Is `code` registered here? (Service-layer squat check.) */
  def exists(code: String): Boolean = synchronized(sessions.contains(code))

  /** Does `code` ask to be garbage-collected when idle? (The reference's
    * session `autoremove` property, `src/oph_parser.h:202` — an
    * autoremove session is reaped by the server instead of living until
    * explicit removal.) */
  def autoremoveEnabled(code: String): Boolean =
    synchronized(sessions.get(code).exists(_.autoremove))

  private def require_(cond: Boolean, msg: String): Unit =
    if (!cond) throw new AuthError(msg)

  def newSession(owner: String, label: String = "",
      code: Option[String] = None): Session = synchronized {
    nextCode += 1
    val c = code.getOrElse(f"sess$nextCode%04d")
    require(!sessions.contains(c), s"session '$c' exists")
    val s = Session(c, owner, label)
    sessions(s.code) = s
    log(s"session ${s.code} created by $owner")
    persist()
    s
  }

  /** action=list: sessions the user can at least read. */
  def list(user: String): Seq[Session] = synchronized {
    sessions.values.toSeq.filter(s => (roleOf(s, user) & RoleRead) != 0)
  }

  /** action=env: session properties key/values. */
  def env(code: String, user: String): Map[String, String] = synchronized {
    val s = get(code)
    require_((roleOf(s, user) & RoleRead) != 0, s"$user cannot read $code")
    Map("session" -> s.code, "label" -> s.label, "owner" -> s.owner,
      "active" -> s.active.toString, "autoremove" -> s.autoremove.toString,
      "users" -> s.roles.size.toString)
  }

  /** action=listusers. */
  def listUsers(code: String, user: String): Seq[(String, String)] = synchronized {
    val s = get(code)
    require_((roleOf(s, user) & RoleRead) != 0, s"$user cannot read $code")
    (s.owner -> renderRole(RoleAll)) +:
      s.roles.toSeq.map { case (u, m) => u -> renderRole(m) }
  }

  /** action=setenv: key in {label, active, autoremove}. */
  def setenv(code: String, user: String, key: String, value: String): Unit =
    synchronized {
      val s = get(code)
      require_((roleOf(s, user) & RoleAdmin) != 0, s"$user cannot setenv on $code")
      key match {
        case "label" => s.label = value
        case "active" => s.active = value.equalsIgnoreCase("yes") ||
          value.equalsIgnoreCase("true")
        case "autoremove" => s.autoremove = value.equalsIgnoreCase("yes") ||
          value.equalsIgnoreCase("true")
        case other => throw new IllegalArgumentException(s"unknown key '$other'")
      }
      log(s"session $code setenv $key=$value by $user")
      persist()
    }

  /** action=grant / revoke (admin-or-owner only). */
  def grant(code: String, user: String, target: String, role: String): Unit =
    synchronized {
      val s = get(code)
      require_((roleOf(s, user) & RoleAdmin) != 0, s"$user cannot grant on $code")
      require_(target != s.owner, "owner role is immutable")
      s.roles(target) = parseRole(role)
      log(s"session $code grant $target=$role by $user")
      persist()
    }

  def revoke(code: String, user: String, target: String): Unit = synchronized {
    val s = get(code)
    require_((roleOf(s, user) & RoleAdmin) != 0, s"$user cannot revoke on $code")
    s.roles.remove(target)
    log(s"session $code revoke $target by $user")
    persist()
  }

  /** action=disable / enable / remove (owner only for remove). */
  def setActive(code: String, user: String, active: Boolean): Unit =
    setenv(code, user, "active", if (active) "yes" else "no")

  /** Server-side removal without an acting user — the autoremove
    * reaper's path (the reference's session GC); also forgets the
    * session in the persisted state. */
  private[server] def purge(code: String): Unit = synchronized {
    sessions.remove(code)
    log(s"session $code purged (autoremove)")
    persist()
  }

  def remove(code: String, user: String): Unit = synchronized {
    val s = get(code)
    require_(s.owner == user, s"only the owner can remove $code")
    require_(!s.active, "disable the session before removing it")
    sessions.remove(code)
    log(s"session $code removed by $user")
    persist()
  }

  private def get(code: String): Session =
    sessions.getOrElse(code,
      throw new NoSuchElementException(s"no session '$code'"))

  // ------------------------------------------- resume / accounting

  /** oph_workflow_save analog: record the request + response document. */
  def saveWorkflow(code: String, request: String, response: String): Int =
    synchronized {
      sessions.get(code) match {
        case Some(s) =>
          val id = s.workflows.size + 1
          s.workflows += SavedWorkflow(id, request, response)
          log(s"session $code workflow $id saved")
          persist()
          id
        case None =>
          // the workflow itself may have removed its own session
          // (oph_manage_session action=remove) — nothing to save INTO,
          // but the run must still complete normally
          log(s"session $code gone before save (removed mid-run)")
          0
      }
    }

  /** Session report (`src/oph_session_report.h:29-31`:
    * `oph_session_report_append_command/link` render the per-session
    * browsable HTML log of submitted commands with links to their
    * output documents). Requires the Read role, like `resume`. The
    * links target the resume route so a browser can walk from the
    * report straight to each saved request/response document. */
  def report(code: String, user: String): String = synchronized {
    val s = get(code)
    require_((roleOf(s, user) & RoleRead) != 0, s"$user cannot read $code")
    def esc(t: String): String = t
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
    // command cell: the workflow NAME when the request parses, else
    // the head of the raw text — the reference logs the submitted
    // command string per (workflowid, markerid). ONE mapper for the
    // whole render: ObjectMapper is expensive and this method holds
    // the service monitor.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def describe(req: String): String =
      try {
        val n = mapper.readTree(req)
        Option(n.get("name")).map(_.asText).getOrElse(req.take(80))
      } catch { case _: Exception => req.take(80) }
    val rows = s.workflows.map { w =>
      val base = s"/services/resume?session=${esc(code)}&id=${w.workflowId}"
      s"""<tr><td>${w.workflowId}</td>
         |<td>${esc(describe(w.request))}</td>
         |<td><code>${esc(w.request.take(200))}</code></td>
         |<td><a href="$base&document_type=request">request</a>
         |<a href="$base&document_type=response">response</a></td></tr>"""
        .stripMargin
    }.mkString("\n")
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8">
       |<title>Session ${esc(code)}</title></head>
       |<body><h1>Session ${esc(code)}${
          if (s.label.nonEmpty) " — " + esc(s.label) else ""}</h1>
       |<p>owner: ${esc(s.owner)} · ${s.workflows.size} workflow(s)</p>
       |<table border="1" cellpadding="4">
       |<tr><th>#</th><th>workflow</th><th>command</th><th>documents</th></tr>
       |$rows
       |</table></body></html>""".stripMargin
  }

  /** oph_resume: retrieve a saved request or response
    * (`document_type=request|response`); workflowId 0 = latest. */
  def resume(code: String, user: String, workflowId: Int,
      documentType: String): String = synchronized {
    val s = get(code)
    require_((roleOf(s, user) & RoleRead) != 0, s"$user cannot read $code")
    val wf =
      if (workflowId <= 0) s.workflows.lastOption
      else s.workflows.find(_.workflowId == workflowId)
    val doc = wf.getOrElse(
      throw new NoSuchElementException(s"no workflow $workflowId in $code"))
    if (documentType == "request") doc.request else doc.response
  }
}
