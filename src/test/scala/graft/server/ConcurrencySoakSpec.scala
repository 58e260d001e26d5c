package graft.server

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSpec
import graft.core.Catalog
import graft.workflow.{Engine, Workflow}

/**
 * Concurrency soak over the server farm — the reference's reason to
 * exist is 128 concurrent SOAP clients (`etc/server.conf.in:27`), and
 * AdmissionSpec only exercises the limits one submission at a time.
 * Here 32 clients race mixed workloads (massive fan-out, long waits,
 * cancel-mid-flight) through real HTTP against a bounded farm:
 *  - admission must stay EXACT under contention (the check-and-
 *    increment is one CAS — N racers at the cap admit exactly
 *    farm+queue, the rest 429);
 *  - every admitted run settles, cancels settle as error, and nothing
 *    deadlocks;
 *  - afterwards the farm is clean: zero running, no leaked activeRuns
 *    or farm permits (a fresh wave must admit), task concurrency
 *    never exceeded TASK_LIMIT.
 */
class ConcurrencySoakSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private def http(url: String, method: String = "GET",
      body: Option[String] = None,
      authHeader: Option[String] = None): (Int, String) = {
    val c = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    authHeader.foreach(c.setRequestProperty("Authorization", _))
    body.foreach { b =>
      c.setDoOutput(true)
      val os = c.getOutputStream
      try os.write(b.getBytes(StandardCharsets.UTF_8)) finally os.close()
    }
    val code = c.getResponseCode
    val is = if (code < 400) c.getInputStream else c.getErrorStream
    val text =
      if (is == null) ""
      else try new String(is.readAllBytes, StandardCharsets.UTF_8)
      finally is.close()
    (code, text)
  }

  private def basic(user: String, pw: String): String =
    "Basic " + Base64.getEncoder.encodeToString(
      s"$user:$pw".getBytes(StandardCharsets.UTF_8))

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("admission under contention is exact: N racers at the cap " +
      "admit exactly farm+queue") {
    withConf("spark.graft.serverFarmSize" -> "2",
        "spark.graft.queueSize" -> "2") {
      val eng = new Engine(spark, new Catalog("soak_cas"))
      // hold all 4 slots (2 running + 2 queued) with 3s waits
      def waitWf(name: String, secs: Int) = Workflow.parse(s"""{
        "name": "$name", "tasks": [
          {"name": "w", "operator": "oph_wait",
           "arguments": ["type=clock", "timeout=$secs"]}
        ]}""")
      val holders = (1 to 4).map(i => eng.runAsync(waitWf(s"hold$i", 3)))
      val t0 = System.currentTimeMillis
      while (eng.runningCount < 4 &&
        System.currentTimeMillis - t0 < 10000) Thread.sleep(20)
      assert(eng.runningCount == 4)
      // 16 threads race the FULL farm simultaneously: with the atomic
      // admit every single one must be refused — a check-then-act
      // admission lets several through (the r12 advice finding)
      val refused = new java.util.concurrent.atomic.AtomicInteger(0)
      val admitted = new java.util.concurrent.atomic.AtomicInteger(0)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val racers = (1 to 16).map { i =>
        val th = new Thread(() => {
          gate.await()
          try { eng.run(waitWf(s"race$i", 1)); admitted.incrementAndGet() }
          catch { case _: Engine.QueueFullError => refused.incrementAndGet() }
        })
        th.start(); th
      }
      gate.countDown()
      racers.foreach(_.join(30000))
      assert(admitted.get == 0 && refused.get == 16,
        s"full farm admitted ${admitted.get} of 16 racers")
      import scala.concurrent.duration._
      holders.foreach(f => scala.concurrent.Await.result(f, 60.seconds))
      assert(eng.runningCount == 0)
      eng.checkAdmission() // and admission is clean again
    }
  }

  test("32 concurrent mixed workflows through HTTP: bounded admission, " +
      "clean drain, no leaked permits, TASK_LIMIT held") {
    withConf("spark.graft.serverFarmSize" -> "8",
        "spark.graft.queueSize" -> "8",
        "spark.graft.taskLimit" -> "4") {
      val eng = new Engine(spark, new Catalog("soak_http"))
      val auth = new AuthService
      auth.addUser("graft", "secret")
      val svc = new HttpService(eng, auth).start()
      try {
        val base = s"http://127.0.0.1:${svc.boundPort}"
        val cred = Some(basic("graft", "secret"))
        // three workload shapes, all async
        def massive(i: Int) = s"""{
          "name": "soak_massive$i", "exec_mode": "async", "tasks": [
            {"name": "loop", "operator": "oph_for",
             "arguments": ["key=j", "values=1|2|3", "parallel=yes"]},
            {"name": "mk", "operator": "oph_randcube",
             "arguments": ["nrows=2000", "array_length=4",
               "container=soak$i", "seed=@j"]},
            {"name": "end", "operator": "oph_endfor", "arguments": []}
          ]}"""
        def waiter(i: Int) = s"""{
          "name": "soak_wait$i", "exec_mode": "async", "tasks": [
            {"name": "w", "operator": "oph_wait",
             "arguments": ["type=clock", "timeout=2"]}
          ]}"""
        def heavy(i: Int) = s"""{
          "name": "soak_heavy$i", "exec_mode": "async", "tasks": [
            {"name": "mk", "operator": "oph_randcube",
             "arguments": ["nrows=2000000", "array_length=40",
               "container=soakh$i"]},
            {"name": "red", "operator": "oph_reduce",
             "arguments": ["operation=sum"],
             "dependencies": [{"task": "mk"}]}
          ]}"""
        val codes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
        val jobids = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
        val cancelIds = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
        val peak = new java.util.concurrent.atomic.AtomicInteger(0)
        // sampler: runningCount must never exceed farm+queue
        @volatile var sampling = true
        val sampler = new Thread(() => while (sampling) {
          peak.getAndUpdate(p => math.max(p, eng.runningCount))
          Thread.sleep(5)
        })
        sampler.setDaemon(true); sampler.start()
        val gate = new java.util.concurrent.CountDownLatch(1)
        val clients = (1 to 32).map { i =>
          val body = (i % 3) match {
            case 0 => heavy(i)
            case 1 => massive(i)
            case _ => waiter(i)
          }
          val th = new Thread(() => {
            gate.await()
            val (code, resp) = http(s"$base/services/execute", "POST",
              Some(body), cred)
            codes.add(code)
            if (code == 200) {
              val id = mapper.readTree(resp).get("jobid").asInt
              jobids.add(id)
              if (i % 3 == 0) cancelIds.add(id) // heavies get cancelled
            }
          })
          th.start(); th
        }
        gate.countDown()
        clients.foreach(_.join(60000))
        assert(codes.size == 32)
        import scala.jdk.CollectionConverters._
        val byCode = codes.asScala.groupBy(identity).map {
          case (c, v) => c -> v.size
        }
        assert(byCode.keySet.subsetOf(Set(200, 429)),
          s"unexpected response codes under load: $byCode")
        assert(byCode.getOrElse(200, 0) == jobids.size)
        // cancel the heavies mid-flight
        Thread.sleep(300)
        cancelIds.asScala.foreach { id =>
          val (cc, _) = http(s"$base/services/cancel?jobid=$id",
            authHeader = cred)
          assert(cc == 200 || cc == 404, s"cancel of $id -> $cc")
        }
        // drain: every admitted run settles (completed, or error for
        // the cancelled ones) — a deadlocked farm times out here
        val deadline = System.nanoTime + 300L * 1000 * 1000 * 1000
        def statusOf(id: Int): String = {
          val (_, sb) = http(s"$base/services/status?jobid=$id",
            authHeader = cred)
          mapper.readTree(sb).get("status").asText
        }
        var pending = jobids.asScala.toSet
        while (pending.nonEmpty && System.nanoTime < deadline) {
          pending = pending.filter(id => statusOf(id) == "running")
          if (pending.nonEmpty) Thread.sleep(250)
        }
        assert(pending.isEmpty, s"runs never settled: $pending")
        val settled = jobids.asScala.map(statusOf).groupBy(identity)
          .map { case (s, v) => s -> v.size }
        assert(settled.keySet.subsetOf(Set("completed", "error")), settled)
        assert(settled.getOrElse("completed", 0) >= 1)
        // the farm drained clean
        val t1 = System.currentTimeMillis
        while (eng.runningCount > 0 &&
          System.currentTimeMillis - t1 < 60000) Thread.sleep(50)
        assert(eng.runningCount == 0, "activeRuns leaked")
        assert(peak.get <= 16,
          s"admission exceeded farm+queue: peak ${peak.get}")
        assert(eng.taskConcurrencyPeak <= 4,
          s"TASK_LIMIT=4 but peak was ${eng.taskConcurrencyPeak}")
        sampling = false
        // no leaked farm permits: a fresh full wave admits cleanly
        val again = (1 to 16).map { i =>
          new Thread(() => codes.add(http(s"$base/services/execute",
            "POST", Some(waiter(100 + i)), cred)._1))
        }
        again.foreach(_.start()); again.foreach(_.join(60000))
        val t2 = System.currentTimeMillis
        while (eng.runningCount > 0 &&
          System.currentTimeMillis - t2 < 120000) Thread.sleep(50)
        assert(eng.runningCount == 0)
        eng.checkAdmission()
      } finally svc.stop()
    }
  }
}
