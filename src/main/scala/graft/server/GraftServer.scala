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
 *   GRAFT_USERS        comma list of user:password pairs
 *                      (default graft:graft)
 *   GRAFT_STATE_DIR    durable state directory: users, tokens and
 *                      session tables survive restarts (unset =
 *                      memory only)
 *   SPARK_GRAFT_CPUS   local[] parallelism (default 32)
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
    val users = sys.env.getOrElse("GRAFT_USERS", "graft:graft")
      .split(',').toSeq.map(_.split(":", 2)).collect {
        case Array(u, p) => (u, p)
      }
    val owner = users.headOption.map(_._1).getOrElse("graft")
    val stateDir = sys.env.get("GRAFT_STATE_DIR")
      .map(java.nio.file.Path.of(_))
    val engine = new Engine(spark, new Catalog("sess0001"), owner,
      sessionStateFile = stateDir.map(_.resolve("session-sess0001.json")))
    val auth = new AuthService(
      stateFile = stateDir.map(_.resolve("auth.tsv")))
    users.foreach { case (u, p) => auth.addUser(u, p) }
    val svc = new HttpService(engine, auth, port,
      stateDir = stateDir).start()
    println(s"[graft-server] listening on :${svc.boundPort} " +
      s"(users: ${users.map(_._1).mkString(",")})")
    sys.addShutdownHook { svc.stop(); spark.stop() }
    Thread.currentThread.join() // serve until killed
  }
}
