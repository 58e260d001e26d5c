package graft.server

import graft.SparkSpec
import graft.core.Catalog
import graft.workflow.{Engine, Workflow}

/**
 * Admission-control knobs per the reference's server contract
 * (`/root/reference/src/oph_gather.h:63-65`, defaults 0 = unlimited):
 * QUEUE_SIZE refuses the (farm+queue+1)th concurrent workflow
 * (`oph_job_list.c:104`) and queues runs beyond the farm; TASK_LIMIT
 * bounds concurrently executing data tasks (`oph_rmanager.c:795-806`).
 */
class AdmissionSpec extends SparkSpec {

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def waitWf(name: String, secs: Int) = Workflow.parse(s"""{
    "name": "$name", "tasks": [
      {"name": "w", "operator": "oph_wait",
       "arguments": ["type=clock", "timeout=$secs"]}
    ]}""")

  test("QUEUE_SIZE: farm queues, farm+queue refuses, drained runs complete") {
    withConf("spark.graft.serverFarmSize" -> "1",
        "spark.graft.queueSize" -> "1") {
      val eng = new Engine(spark, new Catalog("adm1"))
      assert(eng.farmSize == 1 && eng.queueSize == 1)
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      // wf1 occupies the farm slot for ~4s
      val f1 = eng.runAsync(waitWf("adm_w1", 4))
      val t0 = System.currentTimeMillis
      while (eng.runningCount < 1 &&
        System.currentTimeMillis - t0 < 10000) Thread.sleep(20)
      assert(eng.runningCount == 1)
      // wf2 is ADMITTED but queues behind the farm
      val f2 = eng.runAsync(waitWf("adm_w2", 1))
      val t1 = System.currentTimeMillis
      while (eng.runningCount < 2 &&
        System.currentTimeMillis - t1 < 10000) Thread.sleep(20)
      assert(eng.runningCount == 2)
      // wf3 is the farm+queue+1th: refused, loudly
      intercept[Engine.QueueFullError](eng.checkAdmission())
      intercept[Engine.QueueFullError](eng.run(waitWf("adm_w3", 1)))
      // drain: both admitted runs complete
      val r1 = scala.concurrent.Await.result(f1, 60.seconds)
      val r2 = scala.concurrent.Await.result(f2, 60.seconds)
      assert(r1.values.forall(_.status == graft.core.JobStatus.Completed))
      assert(r2.values.forall(_.status == graft.core.JobStatus.Completed))
      // and the engine is admittable again
      eng.checkAdmission()
    }
  }

  test("TASK_LIMIT: parallel branches execute their data tasks one at a time") {
    withConf("spark.graft.taskLimit" -> "1") {
      val eng = new Engine(spark, new Catalog("adm2"))
      assert(eng.taskLimit == 1)
      val wf = Workflow.parse("""{
        "name": "adm_tasks", "tasks": [
          {"name": "loop", "operator": "oph_for",
           "arguments": ["key=i", "values=1|2|3", "parallel=yes"]},
          {"name": "mk", "operator": "oph_randcube",
           "arguments": ["nrows=50", "array_length=4",
             "container=adm@i", "seed=@i"]},
          {"name": "end", "operator": "oph_endfor", "arguments": []}
        ]}""")
      val rs = eng.run(wf)
      assert(rs.values.count(_.status == graft.core.JobStatus.Completed) >= 3)
      assert(eng.taskConcurrencyPeak == 1,
        s"TASK_LIMIT=1 but peak was ${eng.taskConcurrencyPeak}")
    }
  }

  test("oph_get_config leads with the admission knobs; HTTP refuses with 429") {
    withConf("spark.graft.serverFarmSize" -> "1",
        "spark.graft.queueSize" -> "1") {
      val eng = new Engine(spark, new Catalog("adm3"))
      val cfg = eng.run(Workflow.parse("""{
        "name": "cfg", "tasks": [
          {"name": "c", "operator": "oph_get_config", "arguments": []}
        ]}"""))
      val msg = cfg("c").message
      assert(msg.contains("SERVER_FARM_SIZE=1") &&
        msg.contains("QUEUE_SIZE=1") && msg.contains("TASK_LIMIT=0"), msg)

      val auth = new AuthService
      auth.addUser("graft", "secret")
      val svc = new HttpService(eng, auth).start()
      try {
        val base = s"http://127.0.0.1:${svc.boundPort}"
        val cred = "Basic " + java.util.Base64.getEncoder.encodeToString(
          "graft:secret".getBytes("UTF-8"))
        def post(body: String): Int = {
          val c = java.net.http.HttpClient.newHttpClient()
          val req = java.net.http.HttpRequest.newBuilder()
            .uri(java.net.URI.create(s"$base/services/execute"))
            .header("Authorization", cred)
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
            .build()
          c.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
        }
        def asyncWait(name: String, secs: Int) = s"""{
          "name": "$name", "exec_mode": "async",
          "sessionid": "adm3", "tasks": [
            {"name": "w", "operator": "oph_wait",
             "arguments": ["type=clock", "timeout=$secs"]}
          ]}"""
        assert(post(asyncWait("h1", 4)) == 200)
        val t0 = System.currentTimeMillis
        while (eng.runningCount < 1 &&
          System.currentTimeMillis - t0 < 10000) Thread.sleep(20)
        assert(post(asyncWait("h2", 1)) == 200) // queued
        val t1 = System.currentTimeMillis
        while (eng.runningCount < 2 &&
          System.currentTimeMillis - t1 < 10000) Thread.sleep(20)
        // the farm+queue+1th concurrent workflow: 429 Too Many Requests
        assert(post(asyncWait("h3", 1)) == 429)
        // drain so stop() doesn't race live runs
        val t2 = System.currentTimeMillis
        while (eng.runningCount > 0 &&
          System.currentTimeMillis - t2 < 60000) Thread.sleep(50)
      } finally svc.stop()
    }
  }
}
