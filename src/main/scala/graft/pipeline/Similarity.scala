package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Two paths:
 *  - brute-force top-k: broadcast the (small) query set against the
 *    corpus — one narrow pass, no shuffle of the corpus; the only
 *    shuffle is the per-query top-k (k rows per partition survive).
 *  - LSH-bucketed: random-hyperplane signatures; candidates join on
 *    signature prefix buckets, so at scale only docs sharing a bucket
 *    are compared. The planes are pseudo-random from xxhash64 —
 *    deterministic with no driver-side RNG state.
 */
object Similarity {

  /** Cosine similarity between two array columns, computed in double.
    * `zip_with` dot product + norms — executor-local, codegen'd HOFs. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      F.aggregate(zip_with(x, y, (p, q) =>
        p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /**
   * Brute-force top-k cosine neighbors for the rows whose id is in
   * `queryIds`. The query side is tiny → broadcast join (cross of
   * |queries| × corpus), then per-query top-k via window row_number.
   */
  def bruteTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int): DataFrame = {
    val queries = emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = emb.select(col(idCol).as("nn_id"), col(vecCol).as("nvec"))
      .join(broadcast(queries), col("nn_id") =!= col("query_id"))
      .withColumn("score", cosine(col("qvec"), col("nvec")))
    topK(scored, k)
  }

  /** Per-query top-k by cosine score (deterministic nn_id tie-break) —
    * shared by the brute/LSH/IVF paths. Expects columns
    * (query_id, nn_id, score). */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("nn_id"), round(col("score"), 4).as("score"))
  }

  /**
   * Embedding-cosine near-duplicate pairs: vectors whose cosine
   * similarity exceeds `tau`. Candidates come from random-hyperplane
   * band buckets (high-cosine pairs agree on sign bits with high
   * probability), exact cosine verifies — a full-corpus self-join never
   * happens; the join key is the band hash.
   */
  def embeddingDups(emb: DataFrame, idCol: String, vecCol: String,
      tau: Double, nBits: Int = 64, bands: Int = 4,
      dim: Int = 64): DataFrame = {
    // defaults: 16-bit bands — random pairs collide at ~2^-16 per band,
    // near-identical vectors (tau ~ 1) survive with ~0.999 recall;
    // narrower bands flood the verify step with false candidates
    val rows = nBits / bands
    val par = emb.sparkSession.sparkContext.defaultParallelism
    // the persisted frame is ONLY (id, band, bandhash) — 3 narrow
    // columns. The signature pass (the expensive HOF dot products) runs
    // once to produce it; the embedding vectors are NOT carried through
    // the explode or the self-join (bands x rows of wide arrays would
    // dominate the cache and the shuffle at scale)
    val banded = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .repartition(par, col("id"))
      .withColumn("sig", rhpSignature(col("vec"), nBits, dim))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b)))
          .as(Seq("band", "bandhash")))
      .persist()
    // candidates dedupe on the id pair ONLY; vectors join back for the
    // exact-cosine verify afterwards
    val lhs = banded.select(col("band"), col("bandhash"), col("id").as("id_a"))
    val rhs = banded.select(col("band"), col("bandhash"), col("id").as("id_b"))
    val cand = lhs.join(rhs, Seq("band", "bandhash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val vecs = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    cand
      .join(vecs.select(col("id").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
      .withColumn("cos", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }

  /**
   * A built IVF index: the (tiny) centroid table plus the persisted
   * cluster assignment of the corpus. Fit ONCE, queried many times —
   * at 100 TB the k-means fit is a batch job and the assignment is a
   * stored table; rebuilding it per query would be absurd. `unpersist()`
   * releases the assignment cache.
   */
  final case class IvfIndex(
      centroids: Array[Array[Double]],
      assigned: DataFrame) {
    def unpersist(): Unit = assigned.unpersist()
  }

  /**
   * Fit the IVF index: k-means over L2-NORMALIZED vectors (Euclidean
   * k-means on the unit sphere is monotone with cosine, so the cells
   * match the rerank metric; unnormalized vectors would split
   * directions by magnitude and silently drop cosine-nearest neighbors
   * from the probed cells). The assignment (id, vec, cell) persists for
   * reuse across query batches.
   */
  def buildIvfIndex(emb: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 16): IvfIndex = {
    val norm = sqrt(F.aggregate(col("vec"),
      lit(0.0), (a, x) => a + x * x))
    val feats = emb.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .withColumn("nvec", when(norm > 0,
        transform(col("vec"), x => x / norm)).otherwise(col("vec")))
    // IVF training is ALWAYS on a bounded sample (~200 points per
    // centroid, the FAISS heuristic), so run spherical k-means on the
    // DRIVER over that sample — a few MB and a few ms — instead of
    // iterating distributed jobs over the corpus. The cluster then
    // does what a cluster is for: ONE codegen'd assignment pass
    // scoring every vector against the 16 broadcast centroid
    // literals. At 100 TB that is the difference between maxIter full
    // scans and a single one.
    val targetTrain = 200L * nClusters
    val sampled = feats.select(col("id"), col("nvec"))
      .orderBy(xxhash64(col("id"))).limit(targetTrain.toInt)
    val train: Array[Array[Double]] = sampled
      .collect().map(_.getSeq[Double](1).toArray)
    require(train.length >= nClusters,
      s"IVF: ${train.length} training vectors for $nClusters cells")
    val dim = train.head.length
    // deterministic init: evenly spaced points of the (hash-ordered)
    // sample; Lloyd with centroid renormalization (spherical k-means,
    // monotone with the cosine rerank metric); empty cells keep their
    // previous centroid
    var centroids = Array.tabulate(nClusters)(i =>
      train(((i.toLong * train.length) / nClusters).toInt).clone())
    def nearest(v: Array[Double]): Int = {
      var best = 0; var bestDot = Double.MinValue; var c = 0
      while (c < centroids.length) {
        var dot = 0.0; var j = 0
        val cen = centroids(c)
        while (j < dim) { dot += v(j) * cen(j); j += 1 }
        if (dot > bestDot) { bestDot = dot; best = c }
        c += 1
      }
      best
    }
    for (_ <- 0 until 10) {
      val sums = Array.fill(nClusters)(new Array[Double](dim))
      val counts = new Array[Long](nClusters)
      train.foreach { v =>
        val c = nearest(v); counts(c) += 1
        var j = 0; while (j < dim) { sums(c)(j) += v(j); j += 1 }
      }
      centroids = Array.tabulate(nClusters) { c =>
        if (counts(c) == 0) centroids(c)
        else {
          val s = sums(c)
          val n = math.sqrt(s.map(x => x * x).sum)
          if (n > 0) s.map(_ / n) else s
        }
      }
    }
    // distributed assignment: argmax dot against the centroid table,
    // shipped as ONE 2-D constant literal (16 separate 64-element
    // literal arrays would bloat the generated code past what janino
    // compiles quickly; a single constant keeps the codegen tree tiny)
    val centLit = typedLit(centroids.map(_.toSeq).toSeq)
    val dots = transform(centLit, c =>
      F.aggregate(zip_with(col("nvec"), c, (x, y) => x * y),
        lit(0.0), (a, x) => a + x))
    val assigned = feats
      .withColumn("cell",
        (array_position(dots, array_max(dots)) - 1).cast("int"))
      .select(col("id"), col("vec"), col("cell"))
      .persist()
    IvfIndex(centroids, assigned)
  }

  /**
   * IVF (inverted-file) approximate top-k against a PRE-BUILT index:
   * a query probes only its `nProbe` nearest cells and reranks those
   * candidates by exact cosine. The scan is pruned by the cell join —
   * cost drops by ~nProbe/nClusters vs brute force.
   */
  def ivfTopK(index: IvfIndex, queryIds: Seq[Long], k: Int,
      nProbe: Int): DataFrame = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    // per query: nearest nProbe centroids (driver-side — centroids are
    // tiny). Centroids and queries are normalized, so the dot product
    // IS the cosine order; zero vectors score 0 instead of
    // NaN-poisoning the sort.
    val queryVecs = index.assigned.filter(col("id").isin(queryIds: _*))
      .select(col("id"), col("vec")).as[(Long, Seq[Double])].collect()
    val probes = queryVecs.flatMap { case (qid, qv) =>
      val n1 = math.sqrt(qv.map(x => x * x).sum)
      index.centroids.zipWithIndex.map { case (c, cell) =>
        val dot = qv.zip(c).map { case (a, b) => a * b }.sum
        val n2 = math.sqrt(c.map(x => x * x).sum)
        val score = if (n1 > 0 && n2 > 0) dot / (n1 * n2) else 0.0
        (qid, cell, -score)
      }.sortBy(_._3).take(nProbe).map(p => (p._1, p._2))
    }.toSeq.toDF("query_id", "cell")

    val queries = index.assigned.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val cands = index.assigned.join(broadcast(probes), Seq("cell"))
      .join(broadcast(queries), Seq("query_id"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("qvec"), col("id").as("nn_id"),
        col("vec").as("nvec"))
    topK(cands.withColumn("score", cosine(col("qvec"), col("nvec"))), k)
  }

  /** Convenience form fitting a throwaway index — correctness tests and
    * one-shot queries; production callers build the index once. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int,
      nClusters: Int = 16, nProbe: Int = 4): DataFrame = {
    val index = buildIvfIndex(emb, idCol, vecCol, nClusters)
    ivfTopK(index, queryIds, k, nProbe)
  }

  /** Random-hyperplane signature: bit j = sign of <v, plane_j>. The
    * planes are deterministic literals (seeded Scala-side) folded into
    * the expression — per-element work is a plain multiply-add, with no
    * hashing inside the inner loop. */
  def rhpSignature(vec: Column, nBits: Int, dim: Int): Column = {
    val rnd = new scala.util.Random(4242)
    val planes: Seq[Seq[Double]] =
      Seq.fill(nBits)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val planesLit = typedLit(planes)
    // truncate both sides to the shared length: a vector shorter than
    // `dim` would otherwise zip against nulls, nulling the dot product
    // and collapsing every signature to all-zeros (one giant bucket)
    val d = least(size(vec), lit(dim)).cast("int")
    transform(sequence(lit(0), lit(nBits - 1)), j =>
      when(F.aggregate(
        zip_with(slice(vec, lit(1), d),
          slice(element_at(planesLit, (j + 1).cast("int")), lit(1), d),
          (v, p) => v.cast("double") * p),
        lit(0.0), (acc, x) => acc + x) > 0, 1).otherwise(0))
  }

  /**
   * LSH-bucketed approximate top-k: vectors sharing a signature band
   * become candidates; exact cosine reranks within buckets. Recall is
   * tunable via (nBits, bands); the join key is the band hash — the
   * corpus never self-crosses.
   */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int,
      nBits: Int = 16, bands: Int = 4, dim: Int = 64): DataFrame = {
    val rows = nBits / bands
    val sigs = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("sig", rhpSignature(col("vec"), nBits, dim))
      .select(col("id"), col("vec"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b)))
          .as(Seq("band", "bandhash")))
    val queries = sigs.filter(col("id").isin(queryIds: _*))
      .select(col("band"), col("bandhash"),
        col("id").as("query_id"), col("vec").as("qvec"))
    val cands = sigs.join(broadcast(queries), Seq("band", "bandhash"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("qvec"),
        col("id").as("nn_id"), col("vec").as("nvec"))
      .distinct()
    topK(cands.withColumn("score", cosine(col("qvec"), col("nvec"))), k)
  }
}
