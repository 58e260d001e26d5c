package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for the IVF family at the 100x replica (VERDICT r17
  * #4 asks what dominates: fit sample, assignment scan, or rerank).
  * Usage: runMain graft.pipeline.IvfProfile <sfDir>
  */
object IvfProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivf] $what%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val emb = e.unionByName(e.filter(col("vec_id").isin(1L, 2L, 3L))
      .select((col("vec_id") + 9000).as("vec_id"), col("embedding")))
    time("warm: raw count")(emb.count())
    // phase 1: the normalized() HOF scan on its own
    val feats = time("normalized scan (noop)") {
      val f = Similarity.normalizedForProfile(emb, "vec_id", "embedding")
      f.write.format("noop").mode("overwrite").save()
      f
    }
    // phase 2: fit = trainSample + lloyd (inside buildIvfIndex the
    // assignment is lazy; splitting it out needs the internals, so
    // time build-without-materialize vs the first materialize)
    val index = time("buildIvfIndex (fit only)") {
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", nClusters = 16)
    }
    time("assignment materialize") {
      index.assigned.count()
    }
    time("ivfTopK batch1 (3 queries)") {
      Similarity.ivfTopK(index, Seq(9001L, 9002L, 9003L), 10, nProbe = 4)
        .write.format("noop").mode("overwrite").save()
    }
    time("ivfTopK batch2 (2 queries)") {
      Similarity.ivfTopK(index, Seq(4L, 5L), 10, nProbe = 4)
        .write.format("noop").mode("overwrite").save()
    }
    time("brute oracle (3 queries)") {
      Similarity.bruteTopK(emb, "vec_id", "embedding",
        Seq(9001L, 9002L, 9003L), 1)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
