package graft.workflow

import graft.SparkSpec
import graft.core.{Catalog, JobStatus}

class WorkflowSpec extends SparkSpec {

  // ------------------------------------------------------- parsing

  test("parse a JSON request with variables, tasks, dependencies") {
    val spec = Workflow.parse("""{
      "name": "wf", "author": "a", "exec_mode": "sync",
      "variables": {"cubevar": "x"},
      "tasks": [
        {"name": "t1", "operator": "oph_randcube",
         "arguments": ["nrows=10", "array_length=4"]},
        {"name": "t2", "operator": "oph_reduce",
         "arguments": ["operation=avg"],
         "dependencies": [{"task": "t1", "type": "single"}]}
      ]}""")
    assert(spec.name == "wf")
    assert(spec.variables == Map("cubevar" -> "x"))
    assert(spec.tasks.map(_.name) == Seq("t1", "t2"))
    assert(spec.tasks(1).dependencies.head.task == "t1")
    assert(spec.tasks(0).arguments("nrows") == "10")
  }

  // ---------------------------------------------------- validation

  private def mkSpec(deps: (String, Seq[String])*): Workflow.Spec =
    Workflow.Spec(name = "w", tasks = deps.map { case (n, ds) =>
      Workflow.Task(n, "oph_randcube",
        dependencies = ds.map(d => Workflow.Dependency(d)))
    })

  test("topological sort accepts a DAG and orders it") {
    val order = Workflow.validate(mkSpec(
      "a" -> Seq(), "b" -> Seq("a"), "c" -> Seq("a", "b")))
    assert(order.head == 0)
    assert(order.indexOf(2) > order.indexOf(1))
  }

  test("topological sort rejects cycles (reference setup.c:200-288)") {
    intercept[Workflow.ValidationError](
      Workflow.validate(mkSpec("a" -> Seq("c"), "b" -> Seq("a"), "c" -> Seq("b"))))
    intercept[Workflow.ValidationError](
      Workflow.validate(mkSpec("a" -> Seq("a"))))
  }

  test("unknown dependency and duplicate names rejected") {
    intercept[Workflow.ValidationError](
      Workflow.validate(mkSpec("a" -> Seq("nope"))))
    intercept[Workflow.ValidationError](
      Workflow.validate(mkSpec("a" -> Seq(), "a" -> Seq())))
  }

  test("flow-control nesting validation") {
    def flow(ops: String*): Workflow.Spec =
      Workflow.Spec(name = "w", tasks = ops.zipWithIndex.map { case (o, i) =>
        Workflow.Task(s"t$i", o)
      })
    Workflow.validate(flow("oph_for", "oph_randcube", "oph_endfor"))
    Workflow.validate(flow("oph_if", "oph_else", "oph_endif"))
    intercept[Workflow.ValidationError](
      Workflow.validate(flow("oph_for", "oph_endif")))
    intercept[Workflow.ValidationError](
      Workflow.validate(flow("oph_endfor")))
    intercept[Workflow.ValidationError](
      Workflow.validate(flow("oph_if", "oph_randcube")))
  }

  // -------------------------------------------------- substitution

  test("variable substitution: @var, @{var}, builtins, unknown left alone") {
    val vars = Map("x" -> Workflow.Var("42"), "name_1" -> Workflow.Var("v1"))
    assert(Workflow.substitute("a=@x", vars) == "a=42")
    assert(Workflow.substitute("a=@{x}b", vars) == "a=42b")
    assert(Workflow.substitute("a=@name_1", vars) == "a=v1")
    assert(Workflow.substitute("a=@unknown", vars) == "a=@unknown")
    assert(Workflow.substitute("s=@OPH_USER", vars,
      Map("OPH_USER" -> "u")) == "s=u")
  }

  test("substitution: unclosed brace errors, names stop at separators") {
    intercept[Workflow.ValidationError](
      Workflow.substitute("@{x", Map("x" -> Workflow.Var("1"))))
    assert(Workflow.substitute("@x;y=@x", Map("x" -> Workflow.Var("1"))) == "1;y=1")
  }

  // ---------------------------------------------------- conditions

  test("condition evaluator: arithmetic, comparison, logic") {
    assert(Workflow.evalCondition("1+2*3") == 7.0)
    assert(Workflow.evalCondition("(1+2)*3") == 9.0)
    assert(Workflow.evalCondition("10 % 3") == 1.0)
    assert(Workflow.evalCondition("3>2") == 1.0)
    assert(Workflow.evalCondition("3<=2") == 0.0)
    assert(Workflow.evalCondition("1 && 0") == 0.0)
    assert(Workflow.evalCondition("1 || 0") == 1.0)
    assert(Workflow.evalCondition("!0") == 1.0)
    assert(Workflow.evalCondition("2 == 2 && 3 != 4") == 1.0)
    intercept[Workflow.ValidationError](Workflow.evalCondition("1 +"))
  }

  // ------------------------------------------------------ executor

  private def engine() = new Engine(spark, new Catalog("sess"))

  test("2-task DAG: randcube -> reduce, cube pid forwarded") {
    val e = engine()
    val res = e.run(Workflow.parse("""{
      "name": "wf", "tasks": [
        {"name": "make", "operator": "oph_randcube",
         "arguments": ["nrows=20", "array_length=4", "container=c"]},
        {"name": "red", "operator": "oph_reduce",
         "arguments": ["operation=avg"],
         "dependencies": [{"task": "make", "type": "single"}]}
      ]}"""))
    assert(res("make").status == JobStatus.Completed)
    assert(res("red").status == JobStatus.Completed)
    val pid = res("red").cubePid.get
    val reduced = e.cube(pid).get
    assert(reduced.desc.implicitDims.isEmpty)
    assert(reduced.df.count() == 20)
    assert(reduced.desc.level == 1)
  }

  test("import from parquet -> subset -> aggregate end-to-end") {
    val e = engine()
    val res = e.run(Workflow.parse(s"""{
      "name": "wf", "tasks": [
        {"name": "imp", "operator": "oph_importnc",
         "arguments": ["src_path=${sf("lineitem")}", "measure=l_quantity",
                       "exp_dim=l_orderkey|l_linenumber", "container=li"]},
        {"name": "sub", "operator": "oph_subset",
         "arguments": ["subset_dims=l_linenumber", "subset_filter=1:2"],
         "dependencies": [{"task": "imp"}]},
        {"name": "agg", "operator": "oph_aggregate",
         "arguments": ["operation=sum", "group_by=l_orderkey"],
         "dependencies": [{"task": "sub"}]}
      ]}"""))
    assert(res.values.forall(_.status == JobStatus.Completed))
    val out = e.cube(res("agg").cubePid.get).get
    assert(out.df.columns.toSeq == Seq("l_orderkey", "l_quantity"))
    assert(out.df.count() > 0)
    // provenance chain recorded in the catalog
    val aggId = res("agg").cubePid.get.split("/").last.toLong
    assert(e.catalog.provenance(aggId).nonEmpty)
  }

  test("oph_for loops the block once per value, binding @key and index") {
    val e = engine()
    val res = e.run(Workflow.parse("""{
      "name": "wf", "tasks": [
        {"name": "loop", "operator": "oph_for",
         "arguments": ["key=n", "values=5|10"]},
        {"name": "make", "operator": "oph_randcube",
         "arguments": ["nrows=@n", "array_length=2", "container=c@n"]},
        {"name": "end", "operator": "oph_endfor"}
      ]}"""))
    assert(res("make_1").status == JobStatus.Completed)
    assert(res("make_2").status == JobStatus.Completed)
    val c1 = e.cube(res("make_1").cubePid.get).get
    val c2 = e.cube(res("make_2").cubePid.get).get
    assert(c1.df.count() == 5 && c2.df.count() == 10)
  }

  test("oph_for rejects non-IEEE variable names (reference :1705-1717)") {
    val e = engine()
    // the bad key is a task Error that follows on_error (default abort)
    val res = e.run(Workflow.parse("""{
      "name": "wf", "tasks": [
        {"name": "loop", "operator": "oph_for",
         "arguments": ["key=2bad", "values=1"]},
        {"name": "end", "operator": "oph_endfor"}
      ]}"""))
    assert(res("loop").status == JobStatus.Error)
    assert(res("loop").message.contains("invalid variable name"))
  }

  test("oph_for with counter subset string") {
    val e = engine()
    val res = e.run(Workflow.parse("""{
      "name": "wf", "tasks": [
        {"name": "loop", "operator": "oph_for",
         "arguments": ["key=i", "counter=1:3"]},
        {"name": "set", "operator": "oph_set",
         "arguments": ["key=acc", "value=@i"]},
        {"name": "end", "operator": "oph_endfor"}
      ]}"""))
    assert(res("set_3").message == "acc=3")
  }

  test("oph_if selects the true branch; else covers the rest") {
    val e = engine()
    val res = e.run(Workflow.parse("""{
      "name": "wf", "tasks": [
        {"name": "cond", "operator": "oph_if",
         "arguments": ["condition=2>3"]},
        {"name": "a", "operator": "oph_set", "arguments": ["key=x", "value=then"]},
        {"name": "els", "operator": "oph_else"},
        {"name": "b", "operator": "oph_set", "arguments": ["key=x", "value=else"]},
        {"name": "fin", "operator": "oph_endif"},
        {"name": "after", "operator": "oph_set", "arguments": ["key=y", "value=@x"]}
      ]}"""))
    assert(!res.contains("a"))
    assert(res("b").message == "x=else")
    assert(res("after").message == "y=else")
  }

  test("parallel oph_for runs all branches with isolated scopes") {
    val e = engine()
    val res = e.run(Workflow.parse("""{
      "name": "wf", "tasks": [
        {"name": "loop", "operator": "oph_for",
         "arguments": ["key=n", "values=4|6|8", "parallel=yes"]},
        {"name": "make", "operator": "oph_randcube",
         "arguments": ["nrows=@n", "array_length=2", "container=par"]},
        {"name": "end", "operator": "oph_endfor"}
      ]}"""))
    val counts = (1 to 3).map(i =>
      e.cube(res(s"make_$i").cubePid.get).get.df.count()).toSet
    assert(counts == Set(4L, 6L, 8L))
  }

  test("runAsync completes and saves the response for resume") {
    val e = engine()
    val fut = e.runAsync(Workflow.parse("""{
      "name": "wf", "tasks": [
        {"name": "s", "operator": "oph_set", "arguments": ["key=a", "value=1"]}
      ]}"""), requestJson = Some("{}"))
    val res = scala.concurrent.Await.result(fut,
      scala.concurrent.duration.Duration("60s"))
    assert(res("s").status == JobStatus.Completed)
    assert(e.runDataOperator("oph_resume",
      Map("document_type" -> "response", "id" -> "last")).message.contains("s=Completed"))
  }

  test("checkpointed re-run replays completed tasks, re-runs the rest") {
    val e = engine()
    // first run: import succeeds, aggregate fails (bad operation)
    val spec1 = Workflow.parse(s"""{
      "name": "wf", "tasks": [
        {"name": "imp", "operator": "oph_importnc",
         "arguments": ["src_path=${sf("lineitem")}", "measure=l_quantity",
           "exp_dim=l_orderkey|l_linenumber", "container=li"]},
        {"name": "agg", "operator": "oph_aggregate",
         "arguments": ["operation=NOPE", "group_by=l_orderkey"],
         "dependencies": [{"task": "imp"}]}
      ]}""")
    val r1 = e.run(spec1)
    assert(r1("imp").status == JobStatus.Completed)
    assert(r1("agg").status == JobStatus.Error)
    val importedPid = r1("imp").cubePid.get

    // fixed spec: resume from the prior results — import must replay,
    // not re-execute (same PID, no new catalog entry for it)
    val cubesBefore = e.catalog.allCubes.size
    val spec2 = Workflow.parse(s"""{
      "name": "wf", "tasks": [
        {"name": "imp", "operator": "oph_importnc",
         "arguments": ["src_path=${sf("lineitem")}", "measure=l_quantity",
           "exp_dim=l_orderkey|l_linenumber", "container=li"]},
        {"name": "agg", "operator": "oph_aggregate",
         "arguments": ["operation=sum", "group_by=l_orderkey"],
         "dependencies": [{"task": "imp"}]}
      ]}""")
    val r2 = e.runFrom(spec2, spec1, r1)
    assert(r2("imp").cubePid.get == importedPid)      // replayed
    assert(r2("agg").status == JobStatus.Completed)    // re-ran, fixed
    // only ONE new cube minted (the aggregate), no re-import
    assert(e.catalog.allCubes.size == cubesBefore + 1)
    assert(e.cube(r2("agg").cubePid.get).get.df.count() > 0)

    // an EDITED completed task must NOT replay: changing the import's
    // definition re-runs it instead of serving the stale cube
    val spec3 = Workflow.parse(s"""{
      "name": "wf", "tasks": [
        {"name": "imp", "operator": "oph_importnc",
         "arguments": ["src_path=${sf("orders")}", "measure=o_totalprice",
           "exp_dim=o_orderkey", "container=li"]},
        {"name": "agg", "operator": "oph_aggregate",
         "arguments": ["operation=sum", "group_by=o_orderkey"],
         "dependencies": [{"task": "imp"}]}
      ]}""")
    val r3 = e.runFrom(spec3, spec1, r1)
    assert(r3("imp").cubePid.get != importedPid)       // re-imported
    assert(r3("agg").status == JobStatus.Completed)
  }

  test("crash mid-workflow: a NEW engine resumes the checkpoint request " +
      "and re-creates the cube lineage identically") {
    // the oph_workflow_save golden path: run a workflow that dies on
    // its second task, "kill" the server (drop the engine — cubes and
    // memory state are gone, only the run-state file survives), then a
    // FRESH engine honors checkpoint and the final cube matches an
    // uninterrupted run bit-for-bit
    val stateDir = java.nio.file.Files.createTempDirectory("graft_runstate")
    val runFile = stateDir.resolve("runs.json")
    def req(op: String) = s"""{
      "name": "ckwf", "checkpoint": "last", "tasks": [
        {"name": "imp", "operator": "oph_importnc",
         "arguments": ["src_path=${sf("lineitem")}", "measure=l_quantity",
           "exp_dim=l_orderkey|l_linenumber", "container=ck"]},
        {"name": "agg", "operator": "oph_aggregate",
         "arguments": ["operation=$op", "group_by=l_orderkey"],
         "dependencies": [{"task": "imp"}]}
      ]}"""
    val e1 = new Engine(spark, new Catalog("s1"),
      runStateFile = Some(runFile))
    val bad = req("NOPE")
    val r1 = e1.run(Workflow.parse(bad), requestJson = Some(bad))
    assert(r1("imp").status == JobStatus.Completed)
    assert(r1("agg").status == JobStatus.Error)
    assert(java.nio.file.Files.isRegularFile(runFile),
      "partial run was not persisted")

    // --- crash: e1 is gone; a new engine restores the run record
    val e2 = new Engine(spark, new Catalog("s2"),
      runStateFile = Some(runFile))
    val fixed = req("sum")
    val r2 = e2.runRequest(Workflow.parse(fixed), Some(fixed))
    // the import's cube died with the old engine, so checkpoint
    // resume RE-RUNS it (never serves a dangling pid), then the fixed
    // aggregate completes
    assert(r2("imp").status == JobStatus.Completed)
    assert(r2("agg").status == JobStatus.Completed)
    val resumed = e2.cube(r2("agg").cubePid.get).get.df
      .orderBy("l_orderkey").collect().map(_.toString).toSeq

    // --- reference: the same fixed workflow, uninterrupted
    val e3 = new Engine(spark, new Catalog("s3"))
    val r3 = e3.run(Workflow.parse(fixed))
    val fresh = e3.cube(r3("agg").cubePid.get).get.df
      .orderBy("l_orderkey").collect().map(_.toString).toSeq
    assert(resumed == fresh, "resumed lineage diverged from a clean run")

    // --- same-engine checkpoint replays without re-running: an
    // IDENTICAL request against the live record serves every pid from
    // the record and mints NOTHING new
    val cubesBefore = e2.catalog.allCubes.size
    val r4 = e2.runRequest(Workflow.parse(fixed), Some(fixed))
    assert(r4("imp").cubePid == r2("imp").cubePid, "live cube re-imported")
    assert(r4("agg").cubePid == r2("agg").cubePid, "live agg re-ran")
    assert(e2.catalog.allCubes.size == cubesBefore)
  }

  test("runFrom break-in-if propagates to the enclosing loop") {
    val e = engine()
    // loop of 3; iteration task fails with on_error=break inside an if:
    // the loop must stop early instead of running all iterations
    val res = e.run(Workflow.parse("""{
      "name": "wf", "tasks": [
        {"name": "loop", "operator": "oph_for",
         "arguments": ["key=n", "values=1|2|3"]},
        {"name": "cond", "operator": "oph_if", "arguments": ["condition=1"]},
        {"name": "bad", "operator": "oph_reduce",
         "arguments": ["cube=http://localhost/9/9"], "on_error": "break"},
        {"name": "fin", "operator": "oph_endif"},
        {"name": "end", "operator": "oph_endfor"},
        {"name": "after", "operator": "oph_set",
         "arguments": ["key=a", "value=done"]}
      ]}"""))
    assert(res.contains("bad_1"))
    assert(!res.contains("bad_2"))                    // loop broke early
    assert(res("after").status == JobStatus.Completed) // but wf continued
  }

  test("oph_if forward=yes forwards the branch's cube past endif") {
    val e = engine()
    val res = e.run(Workflow.parse(s"""{
      "name": "wf", "tasks": [
        {"name": "cond", "operator": "oph_if",
         "arguments": ["condition=1", "forward=yes"]},
        {"name": "mk", "operator": "oph_randcube",
         "arguments": ["nrows=7", "array_length=3", "container=c"]},
        {"name": "fin", "operator": "oph_endif"},
        {"name": "red", "operator": "oph_reduce",
         "arguments": ["operation=sum"],
         "dependencies": [{"task": "fin"}]}
      ]}"""))
    assert(res("red").status == JobStatus.Completed)
    assert(e.cube(res("red").cubePid.get).get.df.count() == 7)
  }

  test("renderResponse produces the JSON envelope with grids and text") {
    val e = engine()
    val res = e.run(Workflow.parse("""{
      "name": "wf", "tasks": [
        {"name": "mk", "operator": "oph_randcube",
         "arguments": ["nrows=4", "array_length=2", "container=c"]},
        {"name": "peek", "operator": "oph_explorecube",
         "arguments": ["limit_filter=3"],
         "dependencies": [{"task": "mk"}]}
      ]}"""))
    val json = e.renderResponse("wf", res)
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(n.get("source").get("srcname").asText == "wf")
    val classes = (0 until n.get("response").size)
      .map(i => n.get("response").get(i).get("objclass").asText).toSet
    assert(classes == Set("text", "grid"))
  }

  test("oph_set subset_filter compresses value lists") {
    val e = engine()
    val res = e.run(Workflow.parse("""{
      "name": "wf", "tasks": [
        {"name": "s", "operator": "oph_set",
         "arguments": ["key=r", "value=1|2|3|7", "subset_filter=yes"]}
      ]}"""))
    assert(res("s").message == "r=1:3,7")
  }

  test("on_error=skip continues; abort marks the remainder") {
    val e = engine()
    val res = e.run(Workflow.parse("""{
      "name": "wf", "tasks": [
        {"name": "bad", "operator": "oph_reduce",
         "arguments": ["cube=http://localhost/9/9"], "on_error": "skip"},
        {"name": "ok", "operator": "oph_set", "arguments": ["key=a", "value=1"]}
      ]}"""))
    assert(res("bad").status == JobStatus.Error)
    assert(res("ok").status == JobStatus.Completed)

    val res2 = e.run(Workflow.parse("""{
      "name": "wf", "tasks": [
        {"name": "bad", "operator": "oph_reduce",
         "arguments": ["cube=http://localhost/9/9"]},
        {"name": "never", "operator": "oph_set", "arguments": ["key=a", "value=1"]}
      ]}"""))
    assert(res2("bad").status == JobStatus.Error)
    assert(res2("never").status == JobStatus.Aborted)
  }

  test("massive cube filter fans out and intercube combines two pids") {
    val e = engine()
    // build two cubes, then reduce over a massive selector
    val r1 = e.run(Workflow.parse("""{
      "name": "wf", "tasks": [
        {"name": "m1", "operator": "oph_randcube",
         "arguments": ["nrows=8", "array_length=4", "container=c"]},
        {"name": "m2", "operator": "oph_randcube",
         "arguments": ["nrows=8", "array_length=4", "container=c", "seed=7"]}
      ]}"""))
    val red = e.runDataOperator("oph_reduce",
      Map("cube" -> "[measure=measure]", "operation" -> "sum"))
    assert(red.status == JobStatus.Completed)
    val ic = e.runDataOperator("oph_intercube", Map(
      "cube" -> r1("m1").cubePid.get,
      "cube2" -> r1("m2").cubePid.get,
      "operation" -> "sub", "output_measure" -> "d"))
    assert(ic.status == JobStatus.Completed)
    assert(e.cube(ic.cubePid.get).get.desc.measure == "d")
  }

  test("catalog ops through the engine: folder, list, metadata") {
    val e = engine()
    e.runDataOperator("oph_folder", Map("command" -> "mkdir", "path" -> "/work"))
    val mk = e.runDataOperator("oph_randcube",
      Map("nrows" -> "4", "array_length" -> "2", "container" -> "c",
        "cwd" -> "/work"))
    val ls = e.runDataOperator("oph_list",
      Map("path" -> "/work", "recursive" -> "yes"))
    assert(ls.message.contains(mk.cubePid.get))
    e.runDataOperator("oph_metadata", Map("cube" -> mk.cubePid.get,
      "mode" -> "insert", "metadata_key" -> "units", "metadata_value" -> "K"))
    val found = e.runDataOperator("oph_search",
      Map("metadata_key_filter" -> "units"))
    assert(found.message.contains(mk.cubePid.get))
  }
}
