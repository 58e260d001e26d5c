package graft.render

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Field-level conformance of every rendered objclass against the
  * reference JSON writer — names AND order, pinned from the emission
  * sequence in `/root/reference/src/oph_json/oph_json_common.c`
  * (text :431-439, grid :470-548, multigrid :602-855, tree :910-1024,
  * (di)graph :1111-1212, envelope :93-338) and the object model
  * headers (`oph_json_grid.h:38-47`, `oph_json_multigrid.h:50-71`,
  * `oph_json_tree.h:39-49`). A renderer regression (renamed field,
  * reordered key, flat edge list instead of per-node nodelinks)
  * cannot pass silently. */
class ResponseFidelitySpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def fieldNames(
      n: com.fasterxml.jackson.databind.JsonNode): Seq[String] = {
    val it = n.fieldNames()
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) buf += it.next()
    buf.toSeq
  }

  private def contentOf(o: ResponseObject) = {
    val n = mapper.readTree(ResponseWriter.render(o))
    assert(fieldNames(n) == Seq("objkey", "objclass", "objcontent"))
    n.get("objcontent").get(0)
  }

  test("text objcontent: title, message") {
    val c = contentOf(TextObj("summary", "Status", "done"))
    assert(fieldNames(c) == Seq("title", "message"))
  }

  test("grid objcontent: title, rowkeys, rowfieldtypes, rowvalues") {
    val c = contentOf(Grid("list", "Cubes",
      Seq("PID", "LEVEL"), Seq("string", "int"),
      Seq(Seq("c/1/1", "0"), Seq("c/1/2", "1"))))
    assert(fieldNames(c) ==
      Seq("title", "rowkeys", "rowfieldtypes", "rowvalues"))
    assert(c.get("rowvalues").get(1).get(0).asText == "c/1/2")
  }

  test("multigrid objcontent: measure matrix separate from row axes") {
    val c = contentOf(MultiDimGrid("explorecube_dimvalues", "Slice",
      rowKeys = Seq("k"), rowFieldTypes = Seq("long"),
      colKeys = Seq("i"), colFieldTypes = Seq("int"),
      colValues = Seq(Seq("1"), Seq("2")),
      measureName = "v", measureType = "double",
      rowValues = Seq(Seq("10"), Seq("20")),
      measureValues = Seq(Seq("1.0", "2.0"), Seq("3.0", "4.0"))))
    assert(fieldNames(c) == Seq("title", "measurename", "measuretype",
      "rowkeys", "rowfieldtypes", "rowvalues",
      "colkeys", "colfieldtypes", "colvalues", "measurevalues"))
    // rowvalues carries ONLY the row-axis values; the measure matrix
    // lives under measurevalues (oph_json_multigrid.h:50-71)
    assert(c.get("rowvalues").get(0).size == 1)
    assert(c.get("measurevalues").get(1).get(1).asText == "4.0")
  }

  test("tree objcontent: rootnode + per-node nodelinks") {
    val c = contentOf(TreeObj("fs", "Folders", Some("session tree"),
      rootnode = 0, nodeKeys = Seq("name"),
      nodes = Seq(GraphNode(Seq("/")), GraphNode(Seq("a")),
        GraphNode(Seq("b"))),
      links = Seq(GraphLink(0, 1, ""), GraphLink(0, 2, ""))))
    assert(fieldNames(c) == Seq("title", "description", "rootnode",
      "nodekeys", "nodevalues", "nodelinks"))
    assert(c.get("rootnode").asText == "0")
    val nl = c.get("nodelinks")
    assert(nl.size == 3)                      // one element PER NODE
    assert(nl.get(0).size == 2)               // root's outgoing links
    assert(nl.get(0).get(0).get("node").asText == "1")
    assert(nl.get(1).size == 0 && nl.get(2).size == 0)
    // description omitted on links when empty, like the C writer
    assert(!nl.get(0).get(0).has("description"))
  }

  test("tree description is omitted when absent") {
    val c = contentOf(TreeObj("fs", "Folders", None, 0,
      Seq("name"), Seq(GraphNode(Seq("/"))), Seq.empty))
    assert(fieldNames(c) == Seq("title", "rootnode",
      "nodekeys", "nodevalues", "nodelinks"))
  }

  test("digraph objcontent: nodekeys, nodevalues, per-node nodelinks") {
    val g = GraphObj("cubeio", "Provenance", directed = true,
      nodeKeys = Seq("cube"),
      nodes = Seq(GraphNode(Seq("c/1/1")), GraphNode(Seq("c/1/2"))),
      links = Seq(GraphLink(0, 1, "input")))
    val n = mapper.readTree(ResponseWriter.render(g))
    assert(n.get("objclass").asText == "digraph")
    val c = n.get("objcontent").get(0)
    assert(fieldNames(c) ==
      Seq("title", "nodekeys", "nodevalues", "nodelinks"))
    val l = c.get("nodelinks").get(0).get(0)
    assert(fieldNames(l) == Seq("node", "description"))
    assert(l.get("node").asText == "1")
    assert(l.get("description").asText == "input")
  }

  test("envelope: source, consumers, responseKeyset, response") {
    val r = Response(
      source = Map("srckey" -> "sess1", "srcname" -> "wf",
        "producer" -> "graft", "Session Code" -> "sess1"),
      consumers = Seq("alice"),
      objects = Seq(TextObj("status", "Status", "ok"),
        Grid("list", "L", Seq("k"), Seq("string"), Seq(Seq("v")))))
    val n = mapper.readTree(ResponseWriter.render(r))
    assert(fieldNames(n) ==
      Seq("source", "consumers", "responseKeyset", "response"))
    // responseKeyset lists each element's objkey in order (:311)
    assert(n.get("responseKeyset").get(0).asText == "status")
    assert(n.get("responseKeyset").get(1).asText == "list")
    // source leads with the fixed keys, free pairs ride keys/values
    val src = fieldNames(n.get("source"))
    assert(src.take(3) == Seq("srckey", "srcname", "producer"))
    assert(src.takeRight(2) == Seq("keys", "values"))
    assert(n.get("source").get("keys").get(0).asText == "Session Code")
  }

  test("objclass vocabulary matches oph_json_common.h:26-33") {
    def cls(o: ResponseObject): String =
      mapper.readTree(ResponseWriter.render(o)).get("objclass").asText
    assert(cls(TextObj("k", "t", "m")) == "text")
    assert(cls(Grid("k", "t", Seq("a"), Seq("string"), Nil)) == "grid")
    assert(cls(TreeObj("k", "t", None, 0, Seq("n"),
      Seq(GraphNode(Seq("x"))), Nil)) == "tree")
    assert(cls(GraphObj("k", "t", directed = false, Seq("n"),
      Nil, Nil)) == "graph")
  }
}
