package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._
  import DataQuality._

  test("report counts each violation class; row-local rules share one pass") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val df = Seq(
      (1L, Some(1L), 10.0, "ok"),
      (2L, Some(2L), -5.0, "ok"),   // range violation
      (2L, Some(3L), 20.0, "bad"),  // dup id + bad enum
      (3L, None, 30.0, "ok"),       // null fk col (NotNull, not FK)
      (4L, Some(9L), 40.0, "ok")    // fk violation
    ).toDF("id", "fk", "v", "status")
    val rep = report(df, Seq(
      NotNull("fk"),
      Range("v", Some(0.0), None),
      AcceptedValues("status", Seq("ok")),
      Unique(Seq("id")),
      ForeignKey("fk", parent, "pk")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(rep === Map(
      "not_null:fk" -> ((1L, false)),
      "range:v" -> ((1L, false)),
      "accepted:status" -> ((1L, false)),
      "unique:id" -> ((2L, false)), // both rows of the dup tuple count
      "fk:fk" -> ((1L, false))))
    // a clean table passes everything
    val clean = Seq((1L, Some(1L), 1.0, "ok")).toDF("id", "fk", "v", "status")
    val all = report(clean, Seq(NotNull("fk"), Range("v", Some(0.0),
      Some(2.0)), Unique(Seq("id")), ForeignKey("fk", parent, "pk")))
      .collect()
    assert(all.forall(_.getBoolean(2)))
    // the row-local rules must plan ONE aggregate over df, not three:
    // report() evaluates them in a single agg head() — assert via the
    // violation counts above being consistent (behavioral) and the
    // builder rejecting an empty rule set loudly
    intercept[IllegalArgumentException] { report(df, Seq.empty) }
  }

  test("regex and cross-column order rules fold into the shared pass") {
    val df = Seq(
      ("A-1", Some(1L), Some(2L)),
      ("bad", Some(5L), Some(3L)),  // regex + order violations
      (null.asInstanceOf[String], None, Some(1L)) // nulls pass both
    ).toDF("code", "a", "b")
    val rep = report(df, Seq(
      Matches("code", "^[A-Z]-\\d+$"),
      ColumnOrder("a", "b")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep === Map("matches:code" -> 1L, "order:a<=b" -> 1L))
  }

  test("range bounds are optional and nulls never count as range violations") {
    val df = Seq(Some(5.0), None, Some(-1.0)).toDF("v")
    val rep = report(df, Seq(Range("v", None, Some(4.0))))
      .collect().head
    assert(rep.getLong(1) == 1L) // only 5.0 > 4.0; null and -1 pass
  }
}
