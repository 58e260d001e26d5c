package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Transactional small-file compaction for Spark's streaming parquet
 * sink. A per-micro-batch file sink accumulates one file per batch per
 * partition — at ingest scale that is the classic small-files problem:
 * a year of 1-minute batches is half a million tiny files, and every
 * downstream scan pays the per-file open cost. Compaction rewrites the
 * COMMITTED file set to a target file size and swaps it in:
 *
 *  1. committed files come from the sink's `_spark_metadata` log (the
 *     exactly-once source of truth — stray files from failed batches
 *     are invisible to metadata-aware readers and stay invisible here);
 *  2. the compacted files are written alongside the originals; they
 *     are unreferenced by the current log, so concurrent readers still
 *     see exactly the old state;
 *  3. a replacement log directory is prepared with the SAME file names
 *     as the live log (batch ids and any `.compact` files) — the full
 *     compacted listing goes into the latest file and every earlier
 *     one becomes an empty (`v1`-header-only) batch. Preserving the
 *     name set matters twice over: a RESTARTED streaming query (same
 *     checkpoint) still sees every committed batch id and never
 *     re-commits old data, and the sink log's own interval compaction
 *     derives `.compact` positions arithmetically, so the rewritten
 *     history must keep the shape the arithmetic expects;
 *  4. the swap is two directory renames (prepare -> retire old ->
 *     publish new). Each rename is atomic on POSIX/HDFS; a crash
 *     between them leaves the complete new log under
 *     `_spark_metadata.compacting`, from which [[recover]] finishes
 *     the publish. Old data files are deleted only after publish.
 *
 * Consistency contract, stated precisely: crash-safe at every point —
 * recover() completes or rolls the swap forward, a durable retire
 * list replays the old-file GC a crash interrupted, and committed
 * data is never lost. Exclusive by design: a timestamped lock file
 * serializes compactors (recover's orphan sweep cannot tell a crashed
 * run's leftovers from a live run's work-in-progress). NOT lock-free
 * for concurrent readers — in the instant between the two renames
 * `_spark_metadata` does not exist, and a reader starting exactly
 * then falls back to directory listing and can observe old + new
 * files together. Run compaction in the sink's maintenance window
 * (query stopped, no readers starting), the same contract table
 * formats without a single-pointer manifest all carry. The restarted
 * query appends batch ids after the kept one.
 *
 * The log format is the public one the sink writes: a version header
 * line (`v1`) followed by one JSON `SinkFileStatus` per line with an
 * `add` action; `<id>.compact` files hold the full listing at that id.
 */
object SinkCompaction {

  private val MetadataDir = "_spark_metadata"
  private val PrepareDir = "_spark_metadata.compacting"
  private val RetireDir = "_spark_metadata.retired"
  private val RetireList = "_spark_metadata.retirelist"
  private val LockFile = "_spark_metadata.compaction.lock"

  /** Committed data files per the sink log: entries of the latest
    * `.compact` listing (if any) plus all later batch files, `add`
    * actions minus `delete` actions. Returns (absolute paths, latest
    * batch id). */
  def committedFiles(sinkDir: String): (Seq[String], Long) = {
    val log = Paths.get(sinkDir, MetadataDir)
    require(Files.isDirectory(log), s"$sinkDir has no $MetadataDir log")
    val entries = {
      val st = Files.list(log)
      try st.iterator().asScala
        .flatMap { p =>
          val n = p.getFileName.toString
          val compact = n.endsWith(".compact")
          val idStr = if (compact) n.stripSuffix(".compact") else n
          idStr.toLongOption.map(id => (id, compact, p))
        }.toSeq.sortBy(_._1)
      finally st.close()
    }
    require(entries.nonEmpty, s"$sinkDir: empty $MetadataDir log")
    val latestId = entries.map(_._1).max
    val fromCompact = entries.filter(_._2).map(_._1).maxOption
    val relevant = entries.filter { case (id, compact, _) =>
      fromCompact match {
        case Some(c) => id > c || (id == c && compact)
        case None => true
      }
    }
    val added = scala.collection.mutable.LinkedHashSet.empty[String]
    relevant.foreach { case (_, _, p) =>
      Files.readAllLines(p).asScala.foreach { line =>
        if (line.startsWith("{")) {
          val path = jsonField(line, "path")
          val action = jsonField(line, "action")
          action match {
            case Some("add") => path.foreach(added += _)
            case Some("delete") => path.foreach(added -= _)
            case _ => ()
          }
        }
      }
    }
    (added.toSeq, latestId)
  }

  private def jsonField(line: String, key: String): Option[String] = {
    val m = ("\"" + key + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
    m.findFirstMatchIn(line).map(_.group(1)
      .replace("\\/", "/").replace("\\\\", "\\"))
  }

  /** Compact the sink at `sinkDir` to roughly `targetFileBytes` per
    * file. Returns (files before, files after). No-op (returns equal
    * counts) when the sink already meets the target. A `partitionBy`
    * sink compacts PER PARTITION DIRECTORY — the partition values
    * live in the directory names, so files must never leave their
    * directory (and per-partition files are what partition-pruned
    * readers want anyway). */
  def compact(spark: SparkSession, sinkDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      lockTtlMs: Long = 6 * 3600 * 1000L): (Int, Int) = {
    // exclusivity: compaction (and its recover/GC) assumes ONE
    // compactor. Acquisition is ATOMIC (CREATE_NEW — a plain
    // exists-then-write check would let two compactors race through
    // the gap); the lock carries `timestamp:token`, and release
    // deletes it only when the token is OURS, so a TTL takeover can
    // never cascade (the superseded run's finally must not free the
    // new owner's lock). A lock older than the TTL is presumed
    // crashed and replaced — size lockTtlMs ABOVE the longest
    // legitimate run: the takeover heuristic cannot distinguish a
    // slow live compactor from a dead one.
    val lock = Paths.get(sinkDir, LockFile)
    val token = java.util.UUID.randomUUID().toString
    val payload =
      s"${System.currentTimeMillis()}:$token".getBytes("UTF-8")
    var acquired = false
    var attempts = 0
    while (!acquired && attempts < 2) {
      attempts += 1
      try {
        Files.write(lock, payload,
          java.nio.file.StandardOpenOption.CREATE_NEW)
        acquired = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val content =
            try new String(Files.readAllBytes(lock), "UTF-8").trim
            catch { case _: Exception => "" }
          val ts = content.split(':').headOption
            .flatMap(_.toLongOption).getOrElse(0L)
          val age = System.currentTimeMillis() - ts
          if (age < lockTtlMs) throw new IllegalStateException(
            s"$sinkDir: another compaction appears in flight ($lock, " +
              s"${age / 1000}s old); remove the lock if that run is dead")
          Files.deleteIfExists(lock) // stale: retry CREATE_NEW once
      }
    }
    if (!acquired) throw new IllegalStateException(
      s"$sinkDir: could not acquire $lock (lost the takeover race)")
    try compactLocked(spark, sinkDir, targetFileBytes)
    finally releaseLock(lock, token)
  }

  /** Release only OUR lock. A naive read-then-deleteIfExists has a
    * window: a TTL takeover can replace the lock BETWEEN the read and
    * the delete, and the superseded run would then free the new
    * owner's lock. Instead the lock is first ATOMIC_MOVEd to a unique
    * name — whoever wins that rename has exclusive possession of the
    * file — then inspected: ours is deleted, someone else's is moved
    * back. Residual window (documented, POSIX gives no atomic
    * compare-and-delete): while a foreign lock sits under the moved
    * name, a third compactor could CREATE_NEW the primary name; the
    * move-back then fails and the foreign copy is deleted — at that
    * point its owner was already operating on a TTL-expired lock. */
  private def releaseLock(lock: Path, token: String): Unit = {
    val moved = lock.resolveSibling(
      lock.getFileName.toString + ".release." + token)
    try Files.move(lock, moved, StandardCopyOption.ATOMIC_MOVE)
    catch { case _: Exception => return } // lock already gone
    val mine =
      try new String(Files.readAllBytes(moved), "UTF-8").trim
        .endsWith(s":$token")
      catch { case _: Exception => false }
    if (mine) Files.deleteIfExists(moved)
    else {
      try Files.move(moved, lock, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: Exception => Files.deleteIfExists(moved) }
    }
  }

  private def compactLocked(spark: SparkSession, sinkDir: String,
      targetFileBytes: Long): (Int, Int) = {
    recover(sinkDir) // finish any interrupted earlier swap first
    val (committed, latestId) = committedFiles(sinkDir)
    val local = committed.map(stripScheme)
    val root = Paths.get(sinkDir).toAbsolutePath.normalize
    // group by the file's directory RELATIVE to the sink root: "" for
    // a flat sink, "k=v[/k2=v2...]" for a partitioned one
    val byDir = local.groupBy { p =>
      root.relativize(Paths.get(p).toAbsolutePath.normalize.getParent)
        .toString
    }
    val plans = byDir.toSeq.sortBy(_._1).map { case (rel, files) =>
      val bytes = files.map(p => Files.size(Paths.get(p))).sum
      val nOut = math.max(1, math.ceil(
        bytes.toDouble / targetFileBytes).toInt)
      (rel, files, nOut)
    }
    if (plans.forall { case (_, files, nOut) => files.size <= nOut })
      return (local.size, local.size)

    // 2. rewrite each directory group: one batch job per group,
    //    repartitioned to its target count (coalesce would chain the
    //    scan's partitioning; round-robin balances output sizes). The
    //    group's files share their partition values, which stay
    //    encoded in the directory name — the data columns are
    //    rewritten verbatim. Groups submit CONCURRENTLY (bounded
    //    pool): a sink with thousands of partition directories would
    //    otherwise serialize thousands of small jobs on the driver,
    //    while the cluster scheduler interleaves them fine.
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val moved = try {
      val futures = plans.map { case (rel, files, nOut) =>
        if (files.size <= nOut)
          scala.concurrent.Future.successful(files.map(Paths.get(_)))
        else scala.concurrent.Future {
          val df = spark.read.parquet(files: _*).repartition(nOut)
          val tmpOut = Files.createTempDirectory("graft_compact")
          df.write.mode("overwrite").parquet(tmpOut.toString)
          val dstDir = if (rel.isEmpty) root else root.resolve(rel)
          val parts = {
            val st = Files.list(tmpOut)
            try st.iterator().asScala
              .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
            finally st.close()
          }
          val out = parts.zipWithIndex.map { case (p, i) =>
            val dst = dstDir.resolve(
              f"compact-$stamp-part-$i%05d.parquet")
            Files.move(p, dst)
            dst
          }
          deleteRecursive(tmpOut) // _SUCCESS/.crc leftovers
          out
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration.Inf).flatten
    } finally {
      // a failed group rethrows above while sibling rewrites may still
      // be mutating the sink; the lock must NOT be released (nor a
      // retry's recover() sweep run) until every straggler has stopped
      pool.shutdownNow()
      pool.awaitTermination(30, java.util.concurrent.TimeUnit.MINUTES)
    }

    // 3. prepare the replacement log: same file names as the live log,
    //    full listing in the LATEST file, empty batches elsewhere
    val prep = Paths.get(sinkDir, PrepareDir)
    deleteRecursive(prep)
    Files.createDirectory(prep)
    val listing = "v1" +: moved.map { p =>
      val size = Files.size(p)
      val mtime = Files.getLastModifiedTime(p).toMillis
      s"""{"path":"${p.toUri.toString}","size":$size,"isDir":false,""" +
        s""""modificationTime":$mtime,"blockReplication":1,""" +
        s""""blockSize":33554432,"action":"add"}"""
    }
    val liveNames = {
      val st = Files.list(Paths.get(sinkDir, MetadataDir))
      try st.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.stripSuffix(".compact").toLongOption.isDefined)
        .toSeq
      finally st.close()
    }
    val latestName = liveNames
      .maxBy(n => (n.stripSuffix(".compact").toLong, n.length))
    require(latestName.stripSuffix(".compact").toLong == latestId,
      s"sink log changed during compaction: $latestName vs $latestId")
    liveNames.foreach { n =>
      val content = if (n == latestName) listing.mkString("\n") else "v1"
      Files.write(prep.resolve(n), content.getBytes("UTF-8"))
    }

    // 3.5. durable retire list: the old files to delete once the new
    //      log is live. A crash between publish and the delete loop
    //      would otherwise orphan every replaced file forever (they do
    //      not match the compact-* sweep); recover() replays this list.
    val kept = moved.map(_.toAbsolutePath.normalize.toString).toSet
    val toRetire = local.filterNot(p =>
      kept(Paths.get(p).toAbsolutePath.normalize.toString))
    val retireList = Paths.get(sinkDir, RetireList)
    Files.write(retireList, toRetire.mkString("\n").getBytes("UTF-8"))

    // 4. publish: retire old log, promote the prepared one, then GC
    val live = Paths.get(sinkDir, MetadataDir)
    val retired = Paths.get(sinkDir, RetireDir)
    deleteRecursive(retired)
    Files.move(live, retired, StandardCopyOption.ATOMIC_MOVE)
    Files.move(prep, live, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursive(retired)
    toRetire.foreach(p => Files.deleteIfExists(Paths.get(p)))
    Files.deleteIfExists(retireList)
    (local.size, moved.size)
  }

  /** Finish an interrupted swap: if a complete prepared log exists and
    * the live one is missing, publish it; a durable retire list from a
    * crash between publish and GC is replayed (replaced originals do
    * not match the compact-* sweep and would otherwise orphan
    * forever); a leftover retired log is garbage-collected, and so are
    * `compact-*` data files a crashed run moved into place but never
    * published. Safe to call when no OTHER compaction is in flight —
    * the sweep cannot distinguish a crashed run's leftovers from a
    * live run's work-in-progress, which is why [[compact]] takes the
    * lock before calling it. */
  def recover(sinkDir: String): Unit = {
    val live = Paths.get(sinkDir, MetadataDir)
    val prep = Paths.get(sinkDir, PrepareDir)
    val retired = Paths.get(sinkDir, RetireDir)
    if (!Files.exists(live) && Files.isDirectory(prep))
      Files.move(prep, live, StandardCopyOption.ATOMIC_MOVE)
    else deleteRecursive(prep)
    if (Files.exists(live)) {
      deleteRecursive(retired)
      // replay a retire list the crashed run never finished — but only
      // entries the LIVE log does not reference (a pre-publish crash
      // rolled back, and the old files are still committed)
      val retireList = Paths.get(sinkDir, RetireList)
      if (Files.exists(retireList)) {
        val committedNow = committedFiles(sinkDir)._1
          .map(p => Paths.get(stripScheme(p))
            .toAbsolutePath.normalize.toString).toSet
        Files.readAllLines(retireList).asScala
          .filter(_.nonEmpty)
          .map(p => Paths.get(p).toAbsolutePath.normalize)
          .filterNot(p => committedNow(p.toString))
          .foreach(Files.deleteIfExists(_))
        Files.deleteIfExists(retireList)
      }
      // GC compaction orphans: compact-* files the published log does
      // not reference
      val committed = committedFiles(sinkDir)._1
        .map(p => Paths.get(stripScheme(p)).toAbsolutePath.normalize.toString)
        .toSet
      val root = Paths.get(sinkDir).toAbsolutePath.normalize
      val walk = Files.walk(root)
      try {
        val orphans = walk.iterator().asScala.filter { p =>
          val name = p.getFileName.toString
          name.startsWith("compact-") && name.endsWith(".parquet") &&
            !p.toAbsolutePath.normalize.startsWith(live) &&
            !committed(p.toAbsolutePath.normalize.toString)
        }.toSeq
        orphans.foreach(Files.deleteIfExists(_))
      } finally walk.close()
    }
  }

  private def stripScheme(p: String): String =
    if (p.startsWith("file:")) Paths.get(java.net.URI.create(p)).toString
    else p

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      val st = Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally st.close()
    }

  /** Metadata-aware read of the sink (what any downstream consumer
    * does): only committed files are visible. */
  def readCommitted(spark: SparkSession, sinkDir: String): DataFrame =
    spark.read.parquet(sinkDir)
}
