package graft.render

import org.apache.spark.sql.DataFrame

import graft.core._

/**
 * JSON Response writer — renders the typed response object model
 * (grid / multidimgrid / tree / digraph / text) with the reference's
 * objkey vocabulary (`/root/reference/src/oph_json/oph_json_common.c`,
 * objkeys `oph_json_objkeys.h:27-173`; structures `oph_json_grid.h:38-47`,
 * `oph_json_multigrid.h:50-71`, `oph_json_tree.h:39-49`).
 *
 * The writer is driver-side by design: response objects are the
 * human-facing slice (explore/list/metadata outputs), never the data
 * plane. Grids built from DataFrames go through `gridOf(df, limit)`
 * which caps the collect.
 */
object ResponseWriter {

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def q(s: String): String = "\"" + esc(s) + "\""

  private def arr(xs: Seq[String]): String = xs.mkString("[", ",", "]")

  private def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ",", "}")

  /** Render one response object. */
  def render(o: ResponseObject): String = o match {
    case TextObj(objkey, title, message) =>
      obj("objkey" -> q(objkey), "objclass" -> q("text"),
        "title" -> q(title), "message" -> q(message))
    case Grid(objkey, title, keys, fieldTypes, values) =>
      obj("objkey" -> q(objkey), "objclass" -> q("grid"),
        "title" -> q(title),
        "rowkeys" -> arr(keys.map(q)),
        "rowfieldtypes" -> arr(fieldTypes.map(q)),
        "rowvalues" -> arr(values.map(r => arr(r.map(q)))))
    case MultiDimGrid(objkey, title, rowKeys, rowTypes, colKeys, colTypes,
        colValues, measureName, measureType, values) =>
      obj("objkey" -> q(objkey), "objclass" -> q("multidimgrid"),
        "title" -> q(title),
        "rowkeys" -> arr(rowKeys.map(q)),
        "rowfieldtypes" -> arr(rowTypes.map(q)),
        "colkeys" -> arr(colKeys.map(q)),
        "colfieldtypes" -> arr(colTypes.map(q)),
        "colvalues" -> arr(colValues.map(r => arr(r.map(q)))),
        "measurename" -> q(measureName),
        "measuretype" -> q(measureType),
        "rowvalues" -> arr(values.map(r => arr(r.map(q)))))
    case GraphObj(objkey, title, directed, nodeKeys, nodes, links) =>
      obj("objkey" -> q(objkey),
        "objclass" -> q(if (directed) "digraph" else "graph"),
        "title" -> q(title),
        "nodekeys" -> arr(nodeKeys.map(q)),
        "nodevalues" -> arr(nodes.map(n => arr(n.values.map(q)))),
        "links" -> arr(links.map(l => obj(
          "node" -> q(l.node2.toString),
          "description" -> q(l.description),
          "source" -> q(l.node1.toString)))))
  }

  /** Render a full response envelope (source + consumers + objects),
    * following `oph_json_common.h:60-72`. */
  def render(r: Response): String =
    obj(
      "source" -> obj(r.source.toSeq.sortBy(_._1)
        .map { case (k, v) => k -> q(v) }: _*),
      "consumers" -> arr(r.consumers.map(q)),
      "response" -> arr(r.objects.map(render)))

  /** Build a Grid from a DataFrame (driver-side, capped collect). */
  def gridOf(objkey: String, title: String, df: DataFrame,
      limit: Int = 100): Grid = {
    val capped = df.limit(limit)
    val keys = capped.columns.toSeq
    val types = capped.schema.fields.toSeq.map(f => SparkTypeName(f.dataType))
    val values = capped.collect().toSeq.map(row =>
      keys.indices.map(i => Option(row.get(i)).map(_.toString).getOrElse("null")))
    Grid(objkey, title, keys, types, values)
  }

  /** Pivoted cube slice as a MultiDimGrid (`oph_json_multigrid.h:50-71`):
    * row axes = explicit dims, column axis = the implicit dim values of
    * the first row, measure matrix = the in-cell arrays (capped). */
  def multigridOf(objkey: String, title: String, cube: graft.cube.Cube,
      limit: Int = 50): MultiDimGrid = {
    require(cube.hasImplicit, "multigrid needs an implicit dim")
    val dim = cube.desc.implicitDims.head
    val rows = cube.df.limit(limit).collect().toSeq
    val dimIdx = cube.df.columns.indexOf(s"__dim_${dim.name}")
    val measureIdx = cube.df.columns.indexOf(cube.desc.measure)
    val expNames = cube.explicitDimNames
    val expIdx = expNames.map(cube.df.columns.indexOf(_))
    val colValues = rows.headOption.map(r =>
      r.getSeq[Any](dimIdx).map(v => Seq(v.toString))).getOrElse(Seq.empty)
    MultiDimGrid(objkey, title,
      rowKeys = expNames,
      rowFieldTypes = cube.desc.explicitDims.map(_.dataType),
      colKeys = Seq(dim.name),
      colFieldTypes = Seq(dim.dataType),
      colValues = colValues,
      measureName = cube.desc.measure,
      measureType = cube.desc.measureType,
      values = rows.map(r =>
        expIdx.map(i => Option(r.get(i)).map(_.toString).getOrElse("null")) ++
          r.getSeq[Any](measureIdx).map(_.toString)))
  }

  /** Provenance digraph object for oph_cubeio (`oph_json_objkeys.h:38`). */
  def cubeioDigraph(catalog: Catalog, cubeId: Long): GraphObj = {
    val edges = catalog.provenance(cubeId)
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val index = ids.zipWithIndex.toMap
    GraphObj("cubeio", s"Provenance of cube $cubeId", directed = true,
      nodeKeys = Seq("cube"),
      nodes = ids.map(i => GraphNode(Seq(
        catalog.cube(i).map(_.pid(catalog)).getOrElse(i.toString)))),
      links = edges.map(e =>
        GraphLink(index(e._1), index(e._2), "input")))
  }
}
