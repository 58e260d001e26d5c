package graft.workflow

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSpec
import graft.core.{Catalog, JobStatus}

/**
 * Request-level fields beyond the round-3 surface
 * (`/root/reference/src/oph_workflow/oph_workflow_parsing.c:91-95,
 * 270-305`): the four output formats, save=no, cdd-relative paths,
 * nthreads, project/url/direct_output parsing.
 */
class RequestFieldsSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private def engine() = new Engine(spark, new Catalog("sess"),
    sleeper = _ => ())

  private def smallWf(extra: String = ""): String = s"""{
    "name": "wf_fields"$extra, "tasks": [
      {"name": "mk", "operator": "oph_randcube",
       "arguments": ["nrows=4", "array_length=2", "container=c"]},
      {"name": "red", "operator": "oph_reduce",
       "arguments": ["operation=sum"],
       "dependencies": [{"task": "mk"}]},
      {"name": "peek", "operator": "oph_explorecube",
       "arguments": ["limit_filter=10"],
       "dependencies": [{"task": "red"}]}
    ]}"""

  // ------------------------------------------------- output formats

  private def objkeys(rendered: String): Seq[String] = {
    val n = mapper.readTree(rendered).get("response")
    (0 until n.size).map(i => n.get(i).get("objkey").asText)
  }

  test("the four output formats render their reference shapes") {
    val e = engine()
    val spec = Workflow.parse(smallWf())
    val results = e.run(spec)

    val classic = objkeys(e.renderResponse("wf", results, "classic"))
    assert(classic.contains("mk") && classic.contains("red"))
    assert(!classic.contains("workflow_list") && !classic.contains("status"))

    val compact = objkeys(e.renderResponse("wf", results, "compact"))
    assert(compact.contains("status"), "compact collapses texts to a summary")
    assert(!compact.contains("mk") && !compact.contains("workflow_list"))

    val extended = objkeys(e.renderResponse("wf", results, "extended"))
    assert(extended.head == "workflow_list",
      "extended leads with the task-list grid")
    assert(extended.contains("mk"), "extended keeps per-task objects")

    val extCompact = objkeys(
      e.renderResponse("wf", results, "extended_compact"))
    assert(extCompact.head == "workflow_list")
    assert(extCompact.contains("status") && !extCompact.contains("mk"))

    // the task-list grid carries name/status/cube columns
    val grid = mapper.readTree(e.renderResponse("wf", results, "extended"))
      .get("response").get(0).get("objcontent").get(0)
    assert(grid.get("rowkeys").get(0).asText == "TASK NAME")
    assert(grid.get("rowvalues").size == 3)
  }

  test("explorecube renders the summary and dimvalues objects") {
    val e = engine()
    val results = e.run(Workflow.parse("""{
      "name": "wf_explore", "tasks": [
        {"name": "mk", "operator": "oph_randcube",
         "arguments": ["nrows=6", "array_length=2", "container=c"]},
        {"name": "peek", "operator": "oph_explorecube",
         "arguments": ["limit_filter=4", "level=2", "show_index=yes"],
         "dependencies": [{"task": "mk"}]}
      ]}"""))
    val keys = objkeys(e.renderResponse("wf", results, "classic"))
    assert(keys.contains("peek"))
    assert(keys.contains("explorecube_summary"))
    assert(keys.contains("explorecube_dimvalues"))
    val rendered = mapper.readTree(e.renderResponse("wf", results, "classic"))
    val summary = (0 until rendered.get("response").size)
      .map(rendered.get("response").get(_))
      .find(_.get("objkey").asText == "explorecube_summary").get
    assert(summary.get("objcontent").get(0).get("message").asText
      .contains("total rows: 6"))
    // aux objects survive the compact collapse (they carry payload)
    assert(objkeys(e.renderResponse("wf", results, "compact"))
      .contains("explorecube_dimvalues"))
  }

  test("an unknown output_format or save value is a parse error") {
    intercept[Workflow.ValidationError](
      Workflow.parse(smallWf(""", "output_format": "verbose"""")))
    intercept[Workflow.ValidationError](
      Workflow.parse(smallWf(""", "save": "maybe"""")))
  }

  // ------------------------------------------------------ save=no

  test("save=no keeps the run out of the session document store") {
    val e = engine()
    e.run(Workflow.parse(smallWf(""", "save": "no"""")))
    intercept[NoSuchElementException] {
      e.sessions.resume("sess", "graft", 0, "response")
    }
    // default save=yes records it
    e.run(Workflow.parse(smallWf()))
    assert(e.sessions.resume("sess", "graft", 0, "response").nonEmpty)
  }

  // ----------------------------------------------------------- cdd

  test("a relative src_path resolves against the request cdd") {
    val e = engine()
    val res = e.run(Workflow.parse("""{
      "name": "wf_cdd", "cdd": "/root/testdata/sf0.001", "tasks": [
        {"name": "imp", "operator": "oph_importnc",
         "arguments": ["src_path=lineitem.parquet", "measure=l_quantity",
           "exp_dim=l_orderkey", "imp_dim=l_linenumber", "container=li"]}
      ]}"""))
    assert(res("imp").status == JobStatus.Completed)
    assert(e.cube(res("imp").cubePid.get).get.df.count() > 0)
  }

  // ------------------------------------------------- other fields

  test("nthreads feeds the NTHREADS builtin; project/url/direct_output parse") {
    val spec = Workflow.parse(smallWf(
      """, "nthreads": 5, "project": "acct1", "url": "http://x",
         "direct_output": "yes""""))
    assert(spec.nthreads.contains(5))
    assert(spec.project.contains("acct1"))
    assert(spec.url.contains("http://x"))
    assert(spec.directOutput)

    val e = engine()
    val res = e.run(Workflow.parse("""{
      "name": "wf_nt", "nthreads": 3, "tasks": [
        {"name": "mk", "operator": "oph_randcube",
         "arguments": ["nrows=@{NTHREADS}", "array_length=2", "container=c"]}
      ]}"""))
    assert(e.cube(res("mk").cubePid.get).get.df.count() == 3)
  }
}
