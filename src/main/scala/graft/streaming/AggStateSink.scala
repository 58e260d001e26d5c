package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Warehouse

/**
 * Transactional streaming maintenance of a mergeable aggregate state
 * (the [[Warehouse.mergeAggState]] layout: keys, n, sum_v, min_v,
 * max_v), driven from `foreachBatch`. Spark's foreachBatch is
 * AT-LEAST-ONCE — after a crash the last batch re-delivers — and a
 * plain merge would double-count it, so each commit is guarded by the
 * batch id and published with an atomic pointer swap:
 *
 *   stateDir/v_<batchId>/   full state snapshot (parquet)
 *   stateDir/_latest        pointer file, content = committed batchId
 *
 * Commit protocol: a batchId at or below the pointer is a NO-OP
 * (idempotent re-delivery); otherwise the previous snapshot merges
 * with the batch into `v_<batchId>` (mode=overwrite, so a crash
 * mid-write just rewrites on replay), then the pointer moves via
 * write-temp + ATOMIC_MOVE. A crash at ANY point leaves either the
 * old pointer (replay redoes the merge from the old snapshot) or the
 * new one (replay no-ops) — never a half-merged state. Superseded
 * snapshots are pruned after the swap.
 *
 * 100 TB story: the state is one row per key — snapshot size is the
 * key cardinality, not the stream history; each commit costs one
 * key-partitioned merge of (state ∪ batch-partials) exactly as
 * [[Warehouse.mergeAggState]] plans it (single shuffle, map-side
 * combine on the batch side).
 */
object AggStateSink {

  private def pointer(stateDir: String) = Paths.get(stateDir, "_latest")

  /** Latest committed batch id, if any commit has succeeded. */
  def latest(stateDir: String): Option[Long] = {
    val p = pointer(stateDir)
    if (!Files.exists(p)) None
    else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .trim.toLongOption
  }

  /** The latest committed state snapshot, if any. */
  def read(spark: SparkSession, stateDir: String): Option[DataFrame] =
    latest(stateDir).map(id =>
      spark.read.parquet(s"$stateDir/v_$id"))

  /**
   * Fold `batch`'s RAW rows into the persisted state under
   * `batchId`. Returns false (and does nothing) when `batchId` is
   * already covered by the pointer — the re-delivery no-op that makes
   * at-least-once delivery exactly-once in effect.
   */
  def commit(spark: SparkSession, stateDir: String, batchId: Long,
      batch: DataFrame, keys: Seq[String], valueCol: String): Boolean =
    commitWith(spark, stateDir, batchId) {
      case Some(prev) =>
        Warehouse.mergeAggState(prev, batch, keys, valueCol)
      case None => Warehouse.aggState(batch, keys, valueCol)
        .select(keys.map(col) ++ Seq(col("n"),
          col("sum_v").cast("double"), col("min_v").cast("double"),
          col("max_v").cast("double")): _*)
    }

  /**
   * The generic form of the commit protocol: `merge` receives the
   * previous committed snapshot (None on the first batch) and returns
   * the next one. Every guarantee of [[commit]] — batch-id no-op on
   * redelivery, overwrite-on-replay snapshot write, atomic pointer
   * swap, prune-after-publish — holds for ANY state the caller can
   * express as a DataFrame: CDC upserts, SCD2 histories, dedup
   * indexes. Single-writer per stateDir (one streaming query), as
   * foreachBatch already implies.
   */
  def commitWith(spark: SparkSession, stateDir: String, batchId: Long)(
      merge: Option[DataFrame] => DataFrame): Boolean = {
    Files.createDirectories(Paths.get(stateDir))
    val cur = latest(stateDir)
    if (cur.exists(_ >= batchId)) return false
    val merged = merge(cur.map(id =>
      spark.read.parquet(s"$stateDir/v_$id")))
    merged.write.mode("overwrite").parquet(s"$stateDir/v_$batchId")
    val tmp = Paths.get(stateDir, s"_latest.tmp.$batchId")
    Files.write(tmp, batchId.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer(stateDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // prune superseded snapshots AFTER the pointer moved, keeping the
    // immediately-previous one as a ONE-COMMIT GRACE window: a reader
    // that resolved the old pointer lazily (read() returns an
    // unexecuted scan) can still run to completion; anything older
    // than that has had a full commit cycle to drain
    val keepFloor = cur.getOrElse(batchId)
    val st = Files.list(Paths.get(stateDir))
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("v_"))
        .filter(p => p.getFileName.toString.stripPrefix("v_")
          .toLongOption.exists(_ < keepFloor))
        .toSeq
        .foreach(deleteRecursively)
    } finally st.close()
    true
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val st = Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.toSeq.foreach(deleteRecursively)
      } finally st.close()
    }
    Files.deleteIfExists(p)
  }
}
