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

  test("profileEmbeddings: nulls, dim drift, zero norms, norm range") {
    val rows = Seq(
      (1L, Seq(3.0f, 4.0f)),        // norm 5
      (2L, Seq(0.0f, 0.0f)),        // zero norm
      (3L, Seq(1.0f, 0.0f, 0.0f)),  // dim mismatch (modal = 2)
      (4L, null.asInstanceOf[Seq[Float]]),
      (5L, Seq(6.0f, 8.0f)))        // norm 10
    val df = rows.toDF("id", "embedding")
    val r = Profile.profileEmbeddings(df, "embedding").head()
    assert(r.getLong(0) == 5L)            // n_vectors
    assert(r.getLong(1) == 1L)            // n_null
    assert(r.getLong(2) == 1L)            // n_dim_mismatch
    assert(r.getLong(3) == 1L)            // n_zero_norm
    assert(r.getLong(4) == 2L)            // modal_dim
    assert(r.getDouble(5) == 0.0)         // min_norm
    assert(r.getDouble(6) == 10.0)        // max_norm
    // avg over norms {5, 0, 1, 10} = 4.0
    assert(r.getDouble(7) == 4.0)
  }
}
