package graft.server

import org.apache.spark.sql.SparkSession

import graft.core.Catalog
import graft.workflow.Engine

/**
 * Standalone server main — the `oph_server` daemon equivalent
 * (`/root/reference/src/oph_server.c`): builds the Spark session, the
 * engine, the credential store, and serves the HTTP/JSON endpoint until
 * interrupted.
 *
 * Config via environment:
 *   GRAFT_PORT         listen port (default 11732, the reference's)
 *   GRAFT_USERS        comma list of user:password[:admin] triples
 *                      (default graft:graft:admin — the FIRST user
 *                      defaults to admin so manage_user is reachable
 *                      on a fresh deployment)
 *   GRAFT_STATE_DIR    durable state directory: users, tokens and
 *                      session tables survive restarts (unset =
 *                      memory only)
 *   GRAFT_TLS          'dev' = HTTPS with a process-lifetime
 *                      self-signed cert; '<keystore.p12>:<password>'
 *                      = HTTPS with that PKCS12 store; unset = HTTP
 *   SPARK_GRAFT_CPUS   local[] parallelism (default 32)
 *   GRAFT_OPENID_ENDPOINT  OIDC issuer; JWKS fetched from
 *                      <endpoint>/jwk (reference OPENID_ENDPOINT)
 *   GRAFT_OPENID_CLIENT_ID expected token audience (optional)
 *   GRAFT_OPENID_USER_CLAIM claim carrying the user id (default sub)
 *   GRAFT_OPENID_ALLOW_LOCAL_USER  'no' = federation-only: password
 *                      logins refused (default yes)
 */
object GraftServer {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val port = sys.env.get("GRAFT_PORT").flatMap(_.toIntOption)
      .getOrElse(11732)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-server")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // user:password or user:password:admin; an unrecognized third field
    // fails LOUDLY — a password containing ':' would otherwise be
    // silently truncated at the colon
    val users = sys.env.getOrElse("GRAFT_USERS", "graft:graft:admin")
      .split(',').toSeq.map(_.split(":", 3)).map {
        case Array(u, p) => (u, p, false)
        case Array(u, p, flag) if flag.equalsIgnoreCase("admin") =>
          (u, p, true)
        case parts => throw new IllegalArgumentException(
          s"GRAFT_USERS entry '${parts.headOption.getOrElse("")}:...': " +
            "expected user:password or user:password:admin — a third " +
            "field must be 'admin' (passwords may not contain ':')")
      }
    // without any explicit admin the FIRST user gets the bit, so the
    // manage_user surface is reachable on a fresh deployment instead of
    // permanently 403 — announced loudly below since it changes behavior
    val withAdmin =
      if (users.exists(_._3)) users
      else users.zipWithIndex.map { case ((u, p, _), i) => (u, p, i == 0) }
    if (!users.exists(_._3))
      users.headOption.foreach { case (u, _, _) => println(
        s"[graft-server] WARNING: no ':admin' flag in GRAFT_USERS — " +
          s"promoting first user '$u' to admin") }
    val owner = withAdmin.headOption.map(_._1).getOrElse("graft")
    val stateDir = sys.env.get("GRAFT_STATE_DIR")
      .map(java.nio.file.Path.of(_))
    val engine = new Engine(spark, new Catalog("sess0001"), owner,
      sessionStateFile = stateDir.map(_.resolve("session-sess0001.json")),
      runStateFile = stateDir.map(_.resolve("runs-sess0001.json")))
    val openId = OpenIdService.fromEnv(sys.env)
    val auth = new AuthService(
      stateFile = stateDir.map(_.resolve("auth.tsv")),
      openId = openId)
    withAdmin.foreach { case (u, p, admin) => auth.addUser(u, p, admin) }
    val tls = sys.env.get("GRAFT_TLS").map {
      case "dev" => Tls.devSelfSigned()
      case spec => spec.split(":", 2) match {
        case Array(ks, pw) => Tls(java.nio.file.Path.of(ks), pw.toCharArray)
        case _ => throw new IllegalArgumentException(
          "GRAFT_TLS must be 'dev' or '<keystore.p12>:<password>'")
      }
    }
    val svc = new HttpService(engine, auth, port,
      stateDir = stateDir, tls = tls).start()
    println(s"[graft-server] listening on :${svc.boundPort} " +
      s"${if (tls.isDefined) "(https)" else "(http)"} " +
      s"(users: ${withAdmin.map(u => u._1 +
        (if (u._3) "[admin]" else "")).mkString(",")})")
    sys.addShutdownHook { svc.stop(); spark.stop() }
    Thread.currentThread.join() // serve until killed
  }
}
