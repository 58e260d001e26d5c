package graft.workflow

import graft.SparkSpec
import graft.core.{Catalog, JobStatus}

/**
 * Ported reference suites `oph_input_impl` (15 checks,
 * `/root/reference/test/oph_server_test.c:3179-3448`) and
 * `oph_wait_impl` (14 checks, `:3449-3810`), re-expressed against the
 * engine API: each case is the reference's argument fixture, each
 * assertion its expected outcome (OK vs the specific error).
 */
class WaitInputGoldenSpec extends SparkSpec {

  private def engine() = new Engine(spark, new Catalog("sess"),
    sleeper = _ => ())

  /** One-task workflow running oph_input with `args`, on_error=skip so
    * the error lands in the task result. A WAIT task exists in the spec
    * like the reference fixture's task list. */
  private def runInput(args: (String, String)*): Engine.TaskResult = {
    val e = engine()
    val argJson = args.map { case (k, v) => s""""$k=$v"""" }.mkString(",")
    e.run(Workflow.parse(s"""{
      "name": "wf", "variables": {"goodvariable": "value"}, "tasks": [
        {"name": "INPUT", "operator": "oph_input", "on_error": "skip",
         "arguments": [$argJson]},
        {"name": "WAIT", "operator": "oph_wait", "run": "no",
         "arguments": ["timeout=10"]},
        {"name": "WAIT2", "operator": "oph_wait", "run": "no",
         "arguments": ["timeout=20"]}
      ]}""")).apply("INPUT")
  }

  private def runWaitTask(args: (String, String)*): Engine.TaskResult = {
    val e = engine()
    val argJson = args.map { case (k, v) => s""""$k=$v"""" }.mkString(",")
    e.run(Workflow.parse(s"""{
      "name": "wf", "tasks": [
        {"name": "WAIT", "operator": "oph_wait", "on_error": "skip",
         "arguments": [$argJson]}
      ]}""")).apply("WAIT")
  }

  // ------------------------------------------------- oph_input_impl

  test("input 0: key/value/taskname on a declared wait task is OK") {
    val r = runInput("key" -> "variable", "value" -> "value",
      "taskname" -> "WAIT")
    assert(r.status == JobStatus.Completed)
  }

  test("input 1: value=@goodvariable substitutes the workflow variable") {
    val r = runInput("key" -> "variable", "value" -> "@goodvariable",
      "taskname" -> "WAIT")
    assert(r.status == JobStatus.Completed)
    assert(r.message.contains("variable=value"))
  }

  test("input 2: value=@badvariable keeps the unresolved reference") {
    val r = runInput("key" -> "variable", "value" -> "@badvariable",
      "taskname" -> "WAIT")
    assert(r.status == JobStatus.Completed)
    assert(r.message.contains("variable=@badvariable"))
  }

  test("input 3: taskname=wrong -> invalid task name") {
    val r = runInput("key" -> "variable", "value" -> "value",
      "taskname" -> "wrong")
    assert(r.status == JobStatus.Error)
    assert(r.message.contains("task not found or ambiguous"))
  }

  test("input 4: one key, two values -> whole array + _1/_2 bindings") {
    val r = runInput("key" -> "variable", "value" -> "value|discarded",
      "taskname" -> "WAIT")
    assert(r.status == JobStatus.Completed)
  }

  test("input 5: two keys, one value -> bad number of keys") {
    val r = runInput("key" -> "variable|wrong", "value" -> "value",
      "taskname" -> "WAIT")
    assert(r.status == JobStatus.Error)
    assert(r.message.contains("bad number of keys"))
  }

  test("input 6: id=1 targets this workflow and is OK") {
    val r = runInput("key" -> "variable", "value" -> "value",
      "taskname" -> "WAIT", "id" -> "1")
    assert(r.status == JobStatus.Completed)
  }

  test("input 7: id=-1 -> wrong workflow identifier") {
    val r = runInput("key" -> "variable", "value" -> "value",
      "taskname" -> "WAIT", "id" -> "-1")
    assert(r.status == JobStatus.Error)
    assert(r.message.contains("wrong workflow identifier"))
  }

  test("input 8-10: actions continue/wait/abort are accepted") {
    for (a <- Seq("continue", "wait", "abort")) {
      val r = runInput("key" -> "variable", "value" -> "value",
        "taskname" -> "WAIT", "action" -> a)
      assert(r.status == JobStatus.Completed, s"action=$a")
    }
  }

  test("input 11: action=wrong -> error") {
    val r = runInput("key" -> "variable", "value" -> "value",
      "taskname" -> "WAIT", "action" -> "wrong")
    assert(r.status == JobStatus.Error)
    assert(r.message.contains("wrong action"))
  }

  test("input 12-14: invalid variable names are rejected") {
    // @badvariable unresolved, 'special:' separator, leading digit
    for (k <- Seq("@badvariable", "special:", "1ndex")) {
      val r = runInput("key" -> k, "value" -> "value", "taskname" -> "WAIT")
      assert(r.status == JobStatus.Error, s"key=$k")
      assert(r.message.contains("invalid variable name"), s"key=$k")
    }
  }

  // -------------------------------------------------- oph_wait_impl

  test("wait 0: future deadline with run=no validates without waiting") {
    val r = runWaitTask("timeout" -> "2030-01-01 00:00:00", "run" -> "no",
      "timeout_type" -> "deadline")
    assert(r.status == JobStatus.Completed)
  }

  test("wait 1: past deadline clamps to no wait") {
    val r = runWaitTask("timeout" -> "2010-01-01 00:00:00", "run" -> "no",
      "timeout_type" -> "deadline")
    assert(r.status == JobStatus.Completed)
  }

  test("wait 2: wrong timeout_type -> error") {
    val r = runWaitTask("timeout" -> "10", "run" -> "no",
      "timeout_type" -> "wrong")
    assert(r.status == JobStatus.Error)
    assert(r.message.contains("wrong timeout type"))
  }

  test("wait 3: wrong run value -> error") {
    val r = runWaitTask("timeout" -> "10", "run" -> "wrong")
    assert(r.status == JobStatus.Error)
    assert(r.message.contains("'run'"))
  }

  test("wait 4: type=file with a filename validates under run=no") {
    val r = runWaitTask("timeout" -> "10", "run" -> "no",
      "type" -> "file", "filename" -> "filename")
    assert(r.status == JobStatus.Completed)
  }

  test("wait: type=file without filename -> error even under run=no") {
    val r = runWaitTask("timeout" -> "10", "run" -> "no", "type" -> "file")
    assert(r.status == JobStatus.Error)
    assert(r.message.contains("filename"))
  }

  test("wait: wrong type -> error") {
    val r = runWaitTask("timeout" -> "10", "type" -> "wrong")
    assert(r.status == JobStatus.Error)
    assert(r.message.contains("wrong type"))
  }

  test("wait: unparseable deadline date -> conversion error") {
    val r = runWaitTask("timeout" -> "not-a-date",
      "timeout_type" -> "deadline")
    assert(r.status == JobStatus.Error)
    assert(r.message.contains("date conversion"))
  }

  test("wait: input type accepts infinite timeout, clock does not") {
    val bad = runWaitTask("timeout" -> "-1", "type" -> "clock")
    assert(bad.status == JobStatus.Error)
    assert(bad.message.contains("infinity"))
    // type=input with timeout 0 completes immediately (no input came)
    val ok = runWaitTask("timeout" -> "0", "type" -> "input")
    assert(ok.status == JobStatus.Completed)
  }
}
