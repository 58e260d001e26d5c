package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b")
    val (aa, ab) = df.select(
      Similarity.cosine($"a", $"a").as("aa"),
      Similarity.cosine($"a", $"b").as("ab")).as[(Double, Double)].head()
    assert(math.abs(aa - 1.0) < 1e-12)
    assert(math.abs(ab) < 1e-12)
  }

  test("brute top-k returns the true nearest neighbors, ranked") {
    // query 1 = (1,0); 2=(0.9,0.1) closer than 3=(0.5,0.5); 4=(0,1) farthest
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.5f, 0.5f)), (4L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteTopK(emb, "vec_id", "embedding", Seq(1L), 3)
      .orderBy("rank").select("nn_id").as[Long].collect().toSeq
    assert(out == Seq(2L, 3L, 4L))
  }

  test("brute top-k excludes the query itself and caps at k") {
    val emb = (1L to 10L).map(i => (i, Seq(i.toFloat, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteTopK(emb, "vec_id", "embedding", Seq(1L, 2L), 4)
    assert(out.count() == 8)
    assert(out.filter($"nn_id" === $"query_id").count() == 0)
  }

  test("lsh top-k recall: neighbors it returns are true neighbors") {
    val emb = (1L to 50L).map { i =>
      val angle = (i % 10) * 0.05
      (i, Seq(math.cos(angle).toFloat, math.sin(angle).toFloat,
        (i % 3).toFloat * 0.01f, 0.0f))
    }.toDF("vec_id", "embedding")
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding", Seq(1L), 5)
      .select("nn_id").as[Long].collect().toSet
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", Seq(1L), 5,
      nBits = 8, bands = 4, dim = 4)
    val lshIds = lsh.select("nn_id").as[Long].collect().toSet
    // LSH is approximate: every returned id must at least be a candidate
    // with positive similarity, and recall should be non-trivial
    assert(lshIds.nonEmpty)
    assert(lshIds.intersect(brute).nonEmpty)
  }

  test("embeddingDups finds planted duplicates, skips distinct vectors") {
    val base = (1L to 30L).map { i =>
      val a = (i % 7) * 0.4
      (i, Seq(math.cos(a).toFloat, math.sin(a).toFloat,
        (i % 5).toFloat, 1.0f))
    }
    // plant an exact duplicate of id 1 as id 100
    val emb = (base :+ (100L, base.head._2)).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingDups(emb, "vec_id", "embedding",
      tau = 0.9999, nBits = 8, bands = 4, dim = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 100L)))
    // every reported pair truly exceeds the threshold
    val all = Similarity.embeddingDups(emb, "vec_id", "embedding",
      tau = 0.9999, nBits = 8, bands = 4, dim = 4)
      .select("cos").as[Double].collect()
    assert(all.forall(_ >= 0.9999))
  }

  test("embeddingDups expands duplicate cliques and cross-cluster " +
      "near-dups completely") {
    // the exact-collapse optimization groups identical vectors behind
    // one representative; both expansion paths must enumerate every
    // member pair: a 3-member identical clique (intra: 3 pairs) and a
    // near-identical distinct vector (cross: 3 more pairs, one per
    // clique member)
    val v = Seq(1.0f, 0.0f, 0.0f, 1.0f)
    val near = Seq(1.0f, 1e-4f, 0.0f, 1.0f) // cos ~ 0.999999995
    val far = Seq(0.0f, 1.0f, 1.0f, 0.0f)
    val emb = Seq(1L -> v, 2L -> v, 3L -> v, 4L -> near, 9L -> far)
      .toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingDups(emb, "vec_id", "embedding",
      tau = 0.999, nBits = 8, bands = 4, dim = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L),
      (1L, 4L), (2L, 4L), (3L, 4L)), s"got $pairs")
  }

  test("ivf top-k prunes to probed cells and finds dominant neighbors") {
    // two tight clusters far apart: IVF must keep same-cluster
    // neighbors ahead of cross-cluster ones
    val emb = (1L to 40L).map { i =>
      val base = if (i <= 20) (1.0f, 0.0f) else (0.0f, 1.0f)
      (i, Seq(base._1 + (i % 5) * 0.01f, base._2 + (i % 7) * 0.01f,
        0.0f, 0.0f))
    }.toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(emb, "vec_id", "embedding", Seq(1L), 5,
      nClusters = 4, nProbe = 2)
    val ids = out.select("nn_id").as[Long].collect().toSet
    assert(ids.size == 5)
    assert(ids.forall(_ <= 20), s"cross-cluster leak: $ids") // same cluster as query 1
    // ranks are 1..5 with descending scores
    val ranked = out.orderBy("rank").select("score").as[Double].collect()
    assert(ranked.sorted(Ordering[Double].reverse).toSeq == ranked.toSeq)
  }

  test("an IVF index fits once and serves multiple query batches") {
    val emb = (1L to 40L).map { i =>
      val base = if (i <= 20) (1.0f, 0.0f) else (0.0f, 1.0f)
      (i, Seq(base._1 + (i % 5) * 0.01f, base._2 + (i % 7) * 0.01f,
        0.0f, 0.0f))
    }.toDF("vec_id", "embedding")
    val index = Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      nClusters = 4)
    try {
      // the SAME index object answers both batches — no refit anywhere
      val b1 = Similarity.ivfTopK(index, Seq(1L), 3, nProbe = 2)
      val b2 = Similarity.ivfTopK(index, Seq(30L), 3, nProbe = 2)
      assert(b1.select("nn_id").as[Long].collect().forall(_ <= 20))
      assert(b2.select("nn_id").as[Long].collect().forall(_ > 20))
      // the assignment is cached: the per-batch plans read InMemoryRelation
      // instead of re-running the k-means transform
      val plan = b2.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan") ||
        plan.contains("TableCacheQueryStage"), s"no cache in plan:\n$plan")
    } finally index.unpersist()
  }

  test("pq top-k: codes stay narrow, ADC candidates rerank to true order") {
    // two tight clusters far apart in a 8-dim space; PQ must keep
    // same-cluster neighbors ahead of cross-cluster ones after rerank
    val emb = (1L to 40L).map { i =>
      val base = if (i <= 20) Seq(1.0f, 0f, 0f, 0f, 1.0f, 0f, 0f, 0f)
                 else         Seq(0f, 1.0f, 0f, 0f, 0f, 1.0f, 0f, 0f)
      (i, base.zipWithIndex.map { case (b, j) =>
        b + ((i + j) % 5) * 0.01f })
    }.toDF("vec_id", "embedding")
    val index = Similarity.buildPqIndex(emb, "vec_id", "embedding",
      nClusters = 4, m = 4, nCodes = 8)
    try {
      // index frame carries NO vectors — (id, cell, codes) only
      assert(index.encoded.columns.toSeq == Seq("id", "cell", "codes"))
      val out = Similarity.pqTopK(index, Seq(1L), 5, nProbe = 2)
      val ids = out.select("nn_id").as[Long].collect().toSet
      assert(ids.size == 5)
      assert(ids.forall(_ <= 20), s"cross-cluster leak: $ids")
      // rerank is exact: scores equal the true cosine, descending
      val ranked = out.orderBy("rank").select("score").as[Double].collect()
      assert(ranked.sorted(Ordering[Double].reverse).toSeq == ranked.toSeq)
      // a second batch reuses the same encoded table (cached)
      val b2 = Similarity.pqTopK(index, Seq(30L), 3, nProbe = 2)
      assert(b2.select("nn_id").as[Long].collect().forall(_ > 20))
      val plan = b2.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan") ||
        plan.contains("TableCacheQueryStage"), s"no cache in plan:\n$plan")
    } finally index.unpersist()
  }

  test("pq codes round-trip: each code is the nearest subspace codeword") {
    val emb = (1L to 64L).map(i =>
      (i, Seq.tabulate(8)(j => math.sin(i * 0.7 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val index = Similarity.buildPqIndex(emb, "vec_id", "embedding",
      nClusters = 2, m = 2, nCodes = 4)
    try {
      val m = 2; val subDim = 4
      val rows = index.encoded.join(
          emb.select(col("vec_id").as("id"), col("embedding")), Seq("id"))
        .select(col("id"), col("codes"), col("embedding"))
        .as[(Long, Seq[Int], Seq[Float])].collect()
      assert(rows.length == 64)
      rows.foreach { case (_, codes, vec) =>
        val n = math.sqrt(vec.map(x => x.toDouble * x).sum)
        val nv = vec.map(_ / n)
        for (j <- 0 until m) {
          val sub = nv.slice(j * subDim, (j + 1) * subDim)
          val best = index.codebooks(j).zipWithIndex.minBy { case (cw, _) =>
            cw.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum
          }._2
          assert(codes(j) == best, s"code mismatch in subspace $j")
        }
      }
    } finally index.unpersist()
  }

  test("lsh join is bucketed (no cartesian product in the plan)") {
    val emb = (1L to 20L).map(i => (i, Seq(i.toFloat, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val plan = Similarity.lshTopK(emb, "vec_id", "embedding", Seq(1L), 3,
      nBits = 8, bands = 4, dim = 4).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Cross"), s"plan has a cartesian:\n$plan")
  }

  test("ANN recall gate: lsh/ivf/ivf-pq reach recall@10 >= 0.9 on sf0.001") {
    // the structural CORRECTNESS rows for simsearch_* are rows-only
    // (seed-dependent ANN) — THIS pins the quality: on the driver's own
    // deterministic embeddings fixture (500 x 64), each approximate
    // method must recover >= 90% of the brute-force ground truth,
    // averaged over 10 spread queries
    val emb = spark.read.parquet(sf("embeddings"))
      .select(col("vec_id"), col("embedding"))
    val queries = (0L to 9L).map(_ * 50L) // 0, 50, ..., 450
    val k = 10
    def truth(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "nn_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = truth(
      Similarity.bruteTopK(emb, "vec_id", "embedding", queries, k))
    def recall(approx: Map[Long, Set[Long]]): Double =
      queries.map { q =>
        val g = brute.getOrElse(q, Set.empty)
        if (g.isEmpty) 1.0
        else approx.getOrElse(q, Set.empty).intersect(g).size.toDouble / g.size
      }.sum / queries.size
    val rLsh = recall(truth(Similarity.lshTopK(
      emb, "vec_id", "embedding", queries, k, nBits = 16, bands = 8)))
    assert(rLsh >= 0.9, f"LSH recall@10 = $rLsh%.3f < 0.9")
    // the driver embeddings are near-uniform (no planted cluster
    // structure), the hardest case for a coarse quantizer: true
    // neighbors scatter across cells, so hitting a recall target means
    // probing MORE cells — the standard IVF recall/nProbe trade, tuned
    // here exactly as one would against a production recall SLA
    val rIvf = recall(truth(Similarity.ivfTopK(
      emb, "vec_id", "embedding", queries, k, nClusters = 16, nProbe = 12)))
    assert(rIvf >= 0.9, f"IVF recall@10 = $rIvf%.3f < 0.9")
    val pq = Similarity.buildPqIndex(emb, "vec_id", "embedding",
      nClusters = 16, m = 8, nCodes = 16)
    // ADC distortion on unstructured vectors pushes some true
    // neighbors past rank k*refine — widening the exact-rerank pool is
    // the PQ recall lever (FAISS's k_factor), so refine rises with it
    val rPq = recall(truth(
      Similarity.pqTopK(pq, queries, k, nProbe = 12, refine = 16)))
    pq.unpersist()
    assert(rPq >= 0.9, f"IVF-PQ recall@10 = $rPq%.3f < 0.9")
  }

  test("centroids average each dimension per group, 1-based dims") {
    val emb = Seq(
      (1L, "a", Array(1.0f, 2.0f)),
      (2L, "a", Array(3.0f, 6.0f)),
      (3L, "b", Array(10.0f, 20.0f))
    ).toDF("vec_id", "grp", "embedding")
    val got = Similarity.centroids(emb, "grp", "embedding")
      .orderBy("grp", "dim")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("a", 1, 2.0), ("a", 2, 4.0),
      ("b", 1, 10.0), ("b", 2, 20.0)))
  }

  test("semanticDedup: planted exact duplicates always surface in-cell") {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val doubled = e.unionByName(e.select(
      (org.apache.spark.sql.functions.col("vec_id") + 1000000)
        .as("vec_id"),
      org.apache.spark.sql.functions.col("embedding")))
    val pairs = Similarity.semanticDedup(doubled, "vec_id", "embedding",
      tau = 0.999, nClusters = 8)
    val n = e.count()
    val planted = pairs.filter(
      org.apache.spark.sql.functions.col("dup_id") ===
        org.apache.spark.sql.functions.col("keep_id") + 1000000).count()
    assert(planted == n, s"$planted of $n planted duplicates detected")
  }

  test("native cosine expression: bitwise parity with the HOF formulation") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 50).map { i =>
      (i.toLong, Seq.fill(16)(rnd.nextDouble() - 0.5),
        Seq.fill(16)(rnd.nextDouble() - 0.5))
    } ++ Seq(
      (101L, Seq.fill(8)(1.0), Seq.fill(16)(1.0))) // length mismatch -> null
    val df = vecs.toDF("id", "a", "b")
      .select(col("id"),
        Similarity.cosine(col("a"), col("b")).as("nat"),
        Similarity.cosineHof(col("a"), col("b")).as("hof"))
    df.collect().foreach { r =>
      val (n, h) = (r.isNullAt(1), r.isNullAt(2))
      assert(n == h, s"null mismatch for id ${r.getLong(0)}")
      if (!n) {
        // bitwise: accumulation order is identical left-to-right
        assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(2)),
          s"id ${r.getLong(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}")
      }
    }
    // zero-norm input: the native form is TOTAL (NaN), where the HOF
    // division THROWS under ANSI mode — strictly more robust
    val z = Seq((1L, Seq.fill(4)(0.0), Seq.fill(4)(1.0))).toDF("id", "a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("nat")).head()
    assert(z.getDouble(0).isNaN)
    // float arrays widen exactly
    val fv = Seq((1L, Seq(1.0f, 2.0f, 3.0f), Seq(3.0f, 2.0f, 1.0f)))
      .toDF("id", "a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("nat"),
        Similarity.cosineHof(col("a"), col("b")).as("hof"))
      .head()
    assert(fv.getDouble(0) == fv.getDouble(1))
  }

  test("saved IVF index: load parity and file-level partition pruning") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val fitted = Similarity.buildIvfIndex(e, "vec_id", "embedding",
      nClusters = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf_save").toString
    Similarity.saveIvfIndex(fitted, dir)
    val loaded = Similarity.loadIvfIndex(spark, dir)
    // same centroids -> same probes -> identical results
    val qids = Seq(1L, 2L, 3L)
    val a = Similarity.ivfTopK(fitted, qids, 5, nProbe = 2)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val b = Similarity.ivfTopK(loaded, qids, 5, nProbe = 2)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    fitted.unpersist()
    assert(a == b)
    // the probed-cell IN-filter must reach the scan as a PARTITION
    // filter over the cell-partitioned files (pruned before any row
    // is read — the saved-index scale path)
    val p = Similarity.ivfTopK(loaded, qids, 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("cell"),
      s"expected cell partition pruning in:\n$p")
  }

  test("semanticDecontaminate: one codegen pass, no join, exact flags") {
    import spark.implicits._
    val e1 = Array(1.0, 0.0, 0.0, 0.0)
    val close = Array(0.9, 0.1, 0.0, 0.0) // cos vs e1 ~ 0.9939
    val far = Array(0.0, 0.0, 1.0, 0.0)
    val mid = Array(0.5, 0.0, 0.5, 0.0)   // cos vs e1 ~ 0.7071
    val df = Seq(
      (0L, e1.toSeq), (1L, close.toSeq), (2L, far.toSeq), (3L, mid.toSeq)
    ).toDF("vec_id", "embedding")
    val bench = df.filter(col("vec_id") === 0L)
    val out = Similarity.semanticDecontaminate(
      df, bench, "vec_id", "embedding", tau = 0.9)
    val got = out.as[(Long, Double)].collect().toMap
    // the bench member itself is excluded; only the near-copy flags
    assert(got.keySet == Set(1L), got.toString)
    assert(math.abs(got(1L) - 0.9939) < 1e-3)
    // plan shape: the benchmark is a constant table inside the pass —
    // no join, no exchange anywhere
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.contains("Exchange"),
      s"benchmark must fold into the scan pass:\n$p")
  }

  test("semanticDecontaminate: oversize benchmark takes the broadcast " +
      "fallback with identical results (VERDICT r15 scale contract)") {
    import spark.implicits._
    // 60 corpus vectors on a ring, 12-member benchmark: large enough
    // to flag several, small enough to compare exactly
    val corpus = (0 until 60).map(i =>
      (i.toLong, Seq(math.cos(i * 0.1), math.sin(i * 0.1), 0.0)))
      .toDF("vec_id", "embedding")
    val bench = corpus.filter(col("vec_id") % 5 === 0)
    val const = Similarity.semanticDecontaminate(
      corpus, bench, "vec_id", "embedding", tau = 0.95)
      .as[(Long, Double)].collect().toMap
    // force the fallback by shrinking the constant-path bound below
    // the benchmark size: results must be bit-identical
    val fb = Similarity.semanticDecontaminate(
      corpus, bench, "vec_id", "embedding", tau = 0.95,
      maxConstBench = 4)
      .as[(Long, Double)].collect().toMap
    assert(const.nonEmpty, "test benchmark flagged nothing")
    assert(fb == const, s"fallback diverged: $fb vs $const")
    // the fallback must not explode rows: no cartesian/nested-loop of
    // corpus x bench in the plan (only the left_anti id broadcast)
    val p = Similarity.semanticDecontaminate(
      corpus, bench, "vec_id", "embedding", tau = 0.95,
      maxConstBench = 4).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // the hard cap on a benchmark misused as a corpus fails loudly:
    // >262144 "benchmark" vectors is a corpus, not an eval suite
    val huge = spark.range(262200)
      .select(col("id").as("vec_id"),
        array(lit(1.0), col("id").cast("double")).as("embedding"))
    val msg = intercept[IllegalArgumentException] {
      Similarity.semanticDecontaminate(
        corpus, huge, "vec_id", "embedding", tau = 0.95)
    }
    assert(msg.getMessage.contains("fixed-size eval suite"),
      msg.getMessage)
  }

  test("semanticDecontaminate gauges an oversized benchmark with a " +
      "bounded id-only job BEFORE collecting it (ADVICE r16)") {
    import spark.implicits._
    val corpus = Seq((100L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    // every embedding evaluation bumps the accumulator: if the guard
    // still collected the full 262200-row "benchmark" before firing,
    // the count would be >= 262200; the fixed order (id-only bounded
    // gauge, vectors pruned) evaluates only the maxConstBench+1 probe
    val evals = spark.sparkContext.longAccumulator("bench_vec_evals")
    val mkVec = udf { (id: Long) =>
      evals.add(1L); Seq(1.0, id.toDouble)
    }
    val huge = spark.range(262200)
      .select(col("id").as("vec_id"), mkVec(col("id")).as("embedding"))
    val msg = intercept[IllegalArgumentException] {
      Similarity.semanticDecontaminate(
        corpus, huge, "vec_id", "embedding", tau = 0.95)
    }
    assert(msg.getMessage.contains("fixed-size eval suite"), msg.getMessage)
    assert(evals.value < 100000L,
      s"guard materialized the benchmark before firing: ${evals.value} " +
        "vector evaluations (a bounded gauge evaluates ~1k)")
  }

  test("semanticDecontaminate fallback mirrors MaxDotNorm on malformed " +
      "rows: null/dim-mismatch filter out, NaN propagates (ADVICE r16)") {
    import spark.implicits._
    val corpus = Seq(
      (10L, Seq(1.0, 0.0, 0.0)),             // near bench -> flagged
      (11L, Seq(0.0, 1.0, 0.0)),             // orthogonal -> clean
      (12L, null.asInstanceOf[Seq[Double]]), // null -> filtered, no NPE
      (13L, Seq(1.0, 0.0)),                  // dim mismatch -> filtered
      (14L, Seq(Double.NaN, 0.0, 0.0))       // NaN -> propagates
    ).toDF("vec_id", "embedding")
    val bench = Seq(
      (0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.0, 0.0, 1.0))
    ).toDF("vec_id", "embedding")
    def run(cap: Int): Map[Long, Double] = Similarity.semanticDecontaminate(
      corpus, bench, "vec_id", "embedding", tau = 0.9, maxConstBench = cap)
      .as[(Long, Double)].collect().toMap
    val fast = run(16) // constant-table MaxDotNorm path
    val fb = run(1)    // broadcast-UDF fallback (bench of 2 > cap of 1)
    // Spark orders NaN above every double, so the NaN row passes the
    // tau filter on the fast path — the fallback must agree instead of
    // skipping NaN dots via `dot > best` (and must not NPE on null)
    for (got <- Seq(fast, fb)) {
      assert(got.keySet == Set(10L, 14L), got.toString)
      assert(math.abs(got(10L) - 1.0) < 1e-9, got.toString)
      assert(got(14L).isNaN, got.toString)
    }
  }

  test("semanticDecontaminate fallback rejects a ragged benchmark at " +
      "broadcast build with a clear message (ADVICE r17)") {
    import spark.implicits._
    val corpus = Seq((10L, Seq(1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val ragged = Seq(
      (0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0)) // dims 3 and 2
    ).toDF("vec_id", "embedding")
    // cap of 1 forces the broadcast fallback; the old UDF validated
    // incoming vectors against rows(0) only, so a corpus vector of
    // dim 3 would index past the dim-2 bench row inside the dot loop
    val msg = intercept[IllegalArgumentException] {
      Similarity.semanticDecontaminate(
        corpus, ragged, "vec_id", "embedding", tau = 0.9,
        maxConstBench = 1).collect()
    }
    assert(msg.getMessage.contains("ragged"), msg.getMessage)
  }

  test("IVF append drift gate: recall holds or the re-train trigger fires") {
    // VERDICT r11 #7: appendToIvfIndex trusts frozen centroids
    // forever; heavy appends that DRIFT from the fitted distribution
    // erode recall silently. The contract pinned here: after appends
    // grow the index past its fitted size, EITHER recall@10 on
    // drifted queries still clears 0.9 OR ivfDriftStatus flags the
    // re-train — silence is the one disallowed outcome. The drift
    // accounting itself is asserted exactly.
    val dim = 16
    def noise(id: Long, j: Int): Double = ((id * 31 + j * 7) % 17 - 8) / 8.0
    def baseVec(id: Long) = Array.tabulate(dim)(j =>
      (if (j == 0) 5.0 else 0.0) + noise(id, j))
    def driftVec(id: Long) = Array.tabulate(dim)(j =>
      (if (j == 0) -5.0 else 0.0) + noise(id, j))
    val base = (0L until 400L).map(i => (i, baseVec(i).toSeq)).toDF("id", "v")
    val drifted = (1000L until 1500L).map(i => (i, driftVec(i).toSeq))
      .toDF("id", "v")
    val dir = java.nio.file.Files.createTempDirectory("ivf_drift").toString
    val fitted = Similarity.buildIvfIndex(base, "id", "v", nClusters = 8)
    Similarity.saveIvfIndex(fitted, dir)
    fitted.unpersist()
    assert(Similarity.appendToIvfIndex(spark, dir, drifted, "id", "v") == 500L)
    // exact drift accounting: 500 appended over 400 fitted = 1.25x —
    // and the zero-job advisory counter agrees with the authoritative
    // parquet-footer recount
    val drift = Similarity.ivfDriftStatus(spark, dir)
    assert(drift.fittedRows == 400L && drift.totalRows == 900L)
    assert(math.abs(drift.appendedFraction - 1.25) < 1e-9)
    assert(drift.needsRefit, "1.25x growth must trip the default 1.0 trigger")
    assert(Similarity.ivfDriftStatus(spark, dir, recount = true) == drift,
      "advisory counter diverged from the footer recount")
    // recall@10 of the frozen-centroid index on DRIFTED queries
    val qids = (1000L until 1010L).toSeq
    val all = base.unionByName(drifted)
    val k = 10
    def truthOf(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "nn_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = truthOf(Similarity.bruteTopK(all, "id", "v", qids, k))
    val approx = truthOf(Similarity.ivfTopK(
      Similarity.loadIvfIndex(spark, dir), qids, k, nProbe = 2))
    val recall = qids.map { q =>
      val g = brute.getOrElse(q, Set.empty)
      if (g.isEmpty) 1.0
      else approx.getOrElse(q, Set.empty).intersect(g).size.toDouble / g.size
    }.sum / qids.size
    assert(recall >= 0.9 || drift.needsRefit,
      f"recall@10 = $recall%.3f AND no re-train recommendation — the " +
        "silent-erosion failure mode the gate exists to prevent")
  }

  test("semanticDedup plan: cell-key join, never a cartesian") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val plan = Similarity.semanticDedup(e, "vec_id", "embedding",
      tau = 0.9, nClusters = 8).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("cell"), plan) // the bounding join key
  }

  test("native argmax-dot: exact parity with the HOF cell assignment") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(31)
    val cents = Array.fill(16)(Array.fill(8)(rnd.nextDouble() - 0.5))
    val rows = (0 until 80).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() - 0.5))) ++ Seq(
      (200L, Seq.fill(8)(0.0)),          // zero vector -> first cell
      (201L, cents(7).toSeq),            // exactly a centroid
      (202L, Seq.fill(3)(1.0)),          // wrong length -> null
      (203L, Seq.fill(8)(Double.NaN)))   // NaN dots -> first NaN row
    val df = rows.toDF("id", "v").select(col("id"),
      graft.functions.expressions.GraftExpressions
        .argmax_dot(col("v"), cents).as("nat"),
      Similarity.coarseCellHof(col("v").cast("array<double>"), cents)
        .as("hof"))
    df.collect().foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch id ${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getInt(1) == r.getInt(2), s"id ${r.getLong(0)}")
    }
    // a null element null-poisons the HOF dots -> null; native matches
    val nr = Seq((1L, Seq[java.lang.Double](1.0, null, 1.0, 1.0, 1.0, 1.0,
      1.0, 1.0))).toDF("id", "v").select(
      graft.functions.expressions.GraftExpressions
        .argmax_dot(col("v"), cents).as("nat"),
      Similarity.coarseCellHof(col("v").cast("array<double>"), cents)
        .as("hof")).head()
    assert(nr.isNullAt(0) && nr.isNullAt(1))
  }

  test("native max-dot-norm: bit-exact parity with the HOF " +
      "normalize+argmax+recover formulation") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(47)
    val bench = Array.fill(12) {
      val v = Array.fill(8)(rnd.nextDouble() - 0.5)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val rows = (0 until 120).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() - 0.5))) ++ Seq(
      (200L, Seq.fill(8)(0.0)),          // zero norm: dots unnormalized
      (201L, bench(5).toSeq),            // exactly a benchmark row
      (202L, Seq.fill(3)(1.0)),          // wrong length -> null
      (203L, Seq.fill(8)(Double.NaN)))   // NaN norm: raw NaN dots win
    // the OLD fast-path formulation, verbatim: HOF norm + HOF divide,
    // native argmax for the row choice, HOF zip_with+aggregate recover
    val mlit = typedLit(bench.map(_.toSeq).toSeq)
    val norm = sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x))
    val nvec = when(norm > 0,
      transform(col("v"), x => x / norm)).otherwise(col("v"))
    val best = graft.functions.expressions.GraftExpressions
      .argmax_dot(nvec, bench)
    val hof = aggregate(
      zip_with(nvec, element_at(mlit, best + 1), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    val df = rows.toDF("id", "v")
      .select(col("id"), col("v").cast("array<double>").as("v"))
      .select(col("id"),
        graft.functions.expressions.GraftExpressions
          .max_dot_norm(col("v"), bench).as("nat"),
        hof.as("hof"))
    df.collect().foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2),
        s"null mismatch id ${r.getLong(0)}: $r")
      if (!r.isNullAt(1)) {
        val (n1, h1) = (r.getDouble(1), r.getDouble(2))
        assert(java.lang.Double.doubleToLongBits(n1) ==
          java.lang.Double.doubleToLongBits(h1),
          s"id ${r.getLong(0)}: native $n1 != hof $h1")
      }
    }
  }

  test("native pq codes: exact parity with the HOF formulation") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(41)
    // m=4 subspaces of dim 4, 8 codewords each
    val cbs = Array.fill(4)(Array.fill(8)(
      Array.fill(4)(rnd.nextDouble() - 0.5)))
    val rows = (0 until 60).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextDouble() - 0.5))) ++ Seq(
      (200L, Seq.fill(16)(0.0)),
      (201L, (cbs(0)(3) ++ cbs(1)(0) ++ cbs(2)(7) ++ cbs(3)(5)).toSeq))
    val df = rows.toDF("id", "v").select(col("id"),
      graft.functions.expressions.GraftExpressions
        .pq_encode(col("v"), cbs).as("nat"),
      Similarity.pqCodesHof(col("v").cast("array<double>"), cbs)
        .as("hof"))
    df.collect().foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"id ${r.getLong(0)}")
    }
    // the exact-codeword row must encode to its own indices
    val exact = df.filter(col("id") === 201L)
      .select("nat").head().getSeq[Int](0)
    assert(exact == Seq(3, 0, 7, 5))
    // malformed length yields null (the HOF form's per-subspace null
    // codes only arise on inputs the fit's require already rejects)
    val bad = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v").select(
      graft.functions.expressions.GraftExpressions
        .pq_encode(col("v"), cbs).as("nat")).head()
    assert(bad.isNullAt(0))
  }

  test("native rhp signature: exact parity with the HOF formulation") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(21)
    val rows = (0 until 60).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextDouble() - 0.5))) ++ Seq(
      (100L, Seq.fill(16)(rnd.nextDouble() - 0.5)),  // shorter than dim
      (101L, Seq.fill(80)(rnd.nextDouble() - 0.5)),  // longer than dim
      (102L, Seq.fill(64)(0.0)))                     // zero vector
    val df = rows.toDF("id", "v")
      .select(col("id"),
        Similarity.rhpSignature(col("v"), 64, 64).as("nat"),
        Similarity.rhpSignatureHof(col("v"), 64, 64).as("hof"))
    df.collect().foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"id ${r.getLong(0)}")
    }
    // float arrays widen identically through both forms
    val f = Seq((1L, Seq(1.5f, -2.5f, 3.5f))).toDF("id", "v")
      .select(Similarity.rhpSignature(col("v"), 16, 8).as("nat"),
        Similarity.rhpSignatureHof(col("v"), 16, 8).as("hof"))
      .head()
    assert(f.getSeq[Int](0) == f.getSeq[Int](1))
    // a null element null-poisons every dot in the HOF form -> all
    // bits 0; the native form must match
    val nullRow = Seq((1L, Seq[java.lang.Double](1.0, null, 2.0)))
      .toDF("id", "v")
      .select(Similarity.rhpSignature(col("v"), 8, 4).as("nat"),
        Similarity.rhpSignatureHof(col("v"), 8, 4).as("hof"))
      .head()
    assert(nullRow.getSeq[Int](0) == Seq.fill(8)(0))
    assert(nullRow.getSeq[Int](0) == nullRow.getSeq[Int](1))
    // a null in the UNREAD tail (beyond dim) must NOT poison the
    // signature — the HOF form never reads it
    val tailNull = Seq((1L,
      Seq[java.lang.Double](1.0, -2.0, 3.0, 0.5, null, null)))
      .toDF("id", "v")
      .select(Similarity.rhpSignature(col("v"), 8, 4).as("nat"),
        Similarity.rhpSignatureHof(col("v"), 8, 4).as("hof"))
      .head()
    assert(tailNull.getSeq[Int](0) == tailNull.getSeq[Int](1))
    assert(tailNull.getSeq[Int](0).contains(1), "tail null poisoned the sig")
  }

  test("IVF append: frozen-centroid assignment, existing files untouched") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val base = e.filter(col("vec_id") <= 400)
    val extra = e.filter(col("vec_id") > 400)
    val fitted = Similarity.buildIvfIndex(base, "vec_id", "embedding",
      nClusters = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf_app").toString
    Similarity.saveIvfIndex(fitted, dir)
    fitted.unpersist()
    def parquetFiles(): Set[String] = {
      val st = java.nio.file.Files.walk(
        java.nio.file.Paths.get(dir, "assigned"))
      try {
        val b = scala.collection.mutable.Set.empty[String]
        st.iterator().forEachRemaining(p =>
          if (p.toString.endsWith(".parquet")) b += p.toString)
        b.toSet
      } finally st.close()
    }
    val beforeSet = parquetFiles()
    val n = Similarity.appendToIvfIndex(spark, dir, extra,
      "vec_id", "embedding")
    assert(n == extra.count())
    // old files still present and unmodified (append-only layout)
    val afterSet = parquetFiles()
    assert(beforeSet.subsetOf(afterSet) && afterSet.size > beforeSet.size)
    // membership: the reloaded index holds every vector exactly once,
    // and appended vectors' cells match a fresh assignment against the
    // SAME centroids (determinism of the frozen quantizer)
    val loaded = Similarity.loadIvfIndex(spark, dir)
    assert(loaded.assigned.count() == e.count())
    assert(loaded.assigned.select("id").distinct().count() == e.count())
    // a query whose planted twin arrived via append must find it
    val probe = extra.limit(1).select(col("vec_id")).head().getLong(0)
    val top = Similarity.ivfTopK(loaded, Seq(probe), 5, nProbe = 8)
    assert(top.filter(col("query_id") === probe).count() > 0)
  }

  test("semanticDedup skew escape: hot-cell parity with the exact join") {
    import org.apache.spark.sql.functions._
    // SKEWED fixture: every vector points near ONE direction, so the
    // whole corpus lands in a handful of cells — the duplicate-heavy
    // crawl shape that makes the plain within-cell join quadratic.
    // Deterministic jitter keeps cosine(base, v) >> tau only for the
    // planted duplicates.
    val rnd = new scala.util.Random(77)
    val base = Array.fill(32)(rnd.nextDouble() - 0.5)
    val rows = (0 until 400).map { i =>
      val jit = new scala.util.Random(1000 + i)
      val v = base.zipWithIndex.map { case (x, d) =>
        x + 0.3 * (jit.nextDouble() - 0.5) + (if (d == i % 32) 0.2 else 0.0)
      }
      (i.toLong, v.toSeq)
    }
    val e = rows.toDF("vec_id", "embedding")
    val doubled = e.unionByName(e.select(
      (col("vec_id") + 1000000).as("vec_id"), col("embedding")))
    def pairSet(maxCellRows: Long) =
      Similarity.semanticDedup(doubled, "vec_id", "embedding",
        tau = 0.999, nClusters = 4, maxCellRows = maxCellRows,
        dim = 32)
        .select("keep_id", "dup_id").as[(Long, Long)].collect().toSet
    val exact = pairSet(Long.MaxValue)   // cold path everywhere
    val salted = pairSet(50L)            // every populated cell goes hot
    assert(exact.size >= 400, s"fixture lost planted pairs: ${exact.size}")
    assert(salted == exact,
      s"salted path diverged: missing=${(exact -- salted).take(5)} " +
        s"extra=${(salted -- exact).take(5)}")
  }

  test("semanticDedup skew escape plan: hot cells join on the band sub-key") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // maxCellRows=1 forces every populated cell hot
    val hotPlan = Similarity.semanticDedup(e, "vec_id", "embedding",
      tau = 0.9, nClusters = 4, maxCellRows = 1)
      .queryExecution.executedPlan.toString
    assert(hotPlan.contains("bandhash"), hotPlan) // sub-blocked join key
    assert(!hotPlan.contains("CartesianProduct"), hotPlan)
    // and the guard is pay-for-use: the default threshold leaves the
    // plan identical to the plain formulation (no band explode at all)
    val coldPlan = Similarity.semanticDedup(e, "vec_id", "embedding",
      tau = 0.9, nClusters = 4)
      .queryExecution.executedPlan.toString
    assert(!coldPlan.contains("bandhash"), coldPlan)
  }

  test("randomProject matches the driver-side reference and is deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 20L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val outDim = 6
    def refSign(j: Int, k: Int): Double = {
      var h = math.floorMod(j.toLong * outDim + k + 12345L, 2147483647L)
      var r = 0
      while (r < 3) {
        h = math.floorMod(h * h + h * 1103515245L + 12345L, 2147483647L)
        r += 1
      }
      if (((h >> 13) & 1L) == 0L) 1.0 else -1.0
    }
    val expected = vecs.flatMap { case (id, v) =>
      (0 until outDim).map { k =>
        var acc = 0.0
        var j = 0
        while (j < v.length) { acc += v(j).toDouble * refSign(j, k); j += 1 }
        (id, k.toLong,
          BigDecimal(acc / math.sqrt(outDim.toDouble))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toSet
    def run() = Similarity.randomProject(df, "vec_id", "embedding", outDim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val got = run()
    assert(got === expected)
    assert(run() === got) // rerun: no hidden nondeterminism
  }

  test("native sign_project: exact parity with the HOF formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vecs = (1L to 40L).map(i =>
      (i, Array.fill(48)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    def collect(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val native = collect(
      Similarity.randomProject(df, "vec_id", "embedding", 11, seed = 7L))
    val hof = collect(
      Similarity.randomProjectHof(df, "vec_id", "embedding", 11, seed = 7L))
    assert(native === hof)
    // negative seed: the first mixer residue goes negative — signed
    // remainder would diverge from the HOF's pmod here
    assert(collect(Similarity.randomProject(df, "vec_id", "embedding",
        5, seed = -99L)) ===
      collect(Similarity.randomProjectHof(df, "vec_id", "embedding",
        5, seed = -99L)))
    // null element null-poisons every output on both paths
    val withNull = Seq((1L, Array[java.lang.Float](1.0f, null, 2.0f)))
      .toDF("vec_id", "embedding")
    val nRows = Similarity.randomProject(withNull, "vec_id",
      "embedding", 4).collect()
    assert(nRows.length == 4 && nRows.forall(_.isNullAt(2)))
  }

  test("randomProject roughly preserves pairwise distances (JL) and is row-local") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = (1L to 30L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val proj = Similarity.randomProject(df, "vec_id", "embedding", 32)
    assert(!proj.queryExecution.executedPlan.toString.contains("Exchange"),
      "projection must not shuffle")
    val p = proj.collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(_.getDouble(2)) }
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = vecs.map(_._1)
    val ratios = for {
      i <- ids; j <- ids if i < j
      orig = d2(vecs(i.toInt - 1)._2.map(_.toDouble).toSeq,
        vecs(j.toInt - 1)._2.map(_.toDouble).toSeq)
      if orig > 1e-9
    } yield d2(p(i).toSeq, p(j).toSeq) / orig
    // JL with k=32: distances concentrate around 1; allow a wide band
    assert(ratios.forall(r => r > 0.35 && r < 2.2),
      s"distance distortion out of band: min=${ratios.min} max=${ratios.max}")
  }
}