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
    // strings: counts exact; min/max report the character-LENGTH
    // envelope (lexicographic extremes are collation-dependent across
    // engines and useless as a health signal) — nulls skipped
    assert(p("s") == ((4L, 1L, 2L, Some("1"), Some("1"), true)))
  }

  test("profile text policy: min/max are the length envelope") {
    val df = Seq("x", "hello", "hi there!", null)
      .toDF("t")
    val p = Profile.profile(spark, df, Seq("t")).head()
    assert(p.getLong(2) == 1L) // one null, skipped by min/max
    assert(p.getString(4) == "1" && p.getString(5) == "9")
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

  test("the shared statistics pass never plans an Expand") {
    // the lesson this module's split design encodes: multiple
    // count(DISTINCT) columns mixed into one agg rewrite through an
    // Expand whose generated aggregate blows up combinatorially
    // (measured 28 s warm for 4 columns x 150k rows). Pin the shape.
    val df = Seq((1L, 2.0, "a"), (2L, 3.0, "b")).toDF("a", "b", "c")
    val plan = Profile.statsAgg(df, Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
  }

  test("profileEmbeddings: nulls, null elements, dim drift, zero norms, norms") {
    val rows = Seq(
      (1L, Seq[java.lang.Float](3.0f, 4.0f)),        // norm 5
      (2L, Seq[java.lang.Float](0.0f, 0.0f)),        // zero norm
      (3L, Seq[java.lang.Float](1.0f, 0.0f, 0.0f)),  // dim mismatch
      (4L, null.asInstanceOf[Seq[java.lang.Float]]),
      (5L, Seq[java.lang.Float](6.0f, 8.0f)),        // norm 10
      (6L, Seq[java.lang.Float](3.0f, null)))        // null ELEMENT: norm 3
    val df = rows.toDF("id", "embedding")
    val r = Profile.profileEmbeddings(df, "embedding").head()
    assert(r.getLong(0) == 6L)            // n_vectors
    assert(r.getLong(1) == 1L)            // n_null
    assert(r.getLong(2) == 1L)            // n_elem_null (id 6, flagged)
    assert(r.getLong(3) == 1L)            // n_dim_mismatch
    assert(r.getLong(4) == 1L)            // n_zero_norm
    assert(r.getLong(5) == 2L)            // modal_dim
    assert(r.getDouble(6) == 0.0)         // min_norm
    assert(r.getDouble(7) == 10.0)        // max_norm
    // skip-null norms {5, 0, 1, 10, 3} -> avg 3.8 (matches SQL list
    // aggregation, which also skips nulls)
    assert(r.getDouble(8) == 3.8)
  }

  test("profile with exactDistinct=false reports a NULL band flag") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val p = Profile.profile(spark, df, Seq("id"), exactDistinct = false)
      .head()
    // n_distinct falls back to the HLL estimate; the flag must be
    // NULL, never vacuously true
    assert(p.isNullAt(6), "hll_in_band must be null without an exact count")
    assert(p.getLong(3) > 0L)
  }
}
