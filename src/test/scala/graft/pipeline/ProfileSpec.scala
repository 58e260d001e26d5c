package graft.pipeline

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: counts, nulls, distincts, canonical min/max per type") {
    val df = Seq(
      (1L, Some(2.5), "a"),
      (2L, None, "b"),
      (3L, Some(-1.25), null),
      (3L, Some(2.5), "b")
    ).toDF("id", "x", "s")
    val p = Profile.profile(spark, df, Seq("id", "x", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getString(4)), Option(r.getString(5)),
          r.getBoolean(6))).toMap
    assert(p("id") == ((4L, 0L, 3L, Some("1"), Some("3"), true)))
    // doubles render with fixed DECIMAL(28,4) scale
    assert(p("x") == ((4L, 1L, 2L, Some("-1.2500"), Some("2.5000"), true)))
    // strings: counts exact, min/max deliberately null (collation)
    assert(p("s") == ((4L, 1L, 2L, None, None, true)))
  }

  test("profile rejects an empty column list") {
    intercept[IllegalArgumentException](
      Profile.profile(spark, Seq(1).toDF("a"), Seq.empty))
  }

  test("profile of an empty frame yields zero counts") {
    val df = spark.range(0).toDF("id")
    val p = Profile.profile(spark, df, Seq("id")).head()
    assert(p.getLong(1) == 0L && p.getLong(2) == 0L && p.getLong(3) == 0L)
    assert(p.isNullAt(4) && p.isNullAt(5))
  }
}
