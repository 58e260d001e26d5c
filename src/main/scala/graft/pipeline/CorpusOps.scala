package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/**
 * Corpus-preparation operators a large-scale training-data pipeline
 * needs beyond scoring/dedup: Gopher-style repetition filters,
 * benchmark decontamination, URL/domain accounting, and token-budget
 * shard packing. Everything row-local is a codegen'd builtin
 * composition; the two operators that must see global state
 * (decontamination, packing) are shaped for 100 TB — a broadcast
 * semi-join against the (small) benchmark n-gram set, and a
 * two-level distributed prefix sum instead of a single-partition
 * global window.
 */
object CorpusOps {

  private def toks(text: Column): Column = TextAnalysis.tokensLower(text)

  /** Hashes of the text's word n-gram sliding windows — the NATIVE
    * codegen expression (one tight loop per doc). The interpreted HOF
    * equivalent (`transform(sequence, i -> concat_ws(slice))`) costs
    * ~13 us per gram; this is the difference between 3.2 s and 60 ms
    * for 250k grams. Hash values equal
    * `xxhash64(concat_ws(" ", slice(tokens, i, n)))` exactly. */
  private def gramHashes(text: Column, n: Int): Column =
    graft.functions.expressions.HashExpressions.word_gram_hashes(text, n)

  /** Duplicated word-n-gram fraction of `text` alone (0 when too
    * short) — the single most selective Gopher gate, exposed
    * separately so a pipeline can filter row-locally without paying
    * for the full stats frame. */
  def dupNgramFrac(text: Column, n: Int): Column = {
    val g = gramHashes(text, n)
    when(size(g) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(g)).cast("double") / size(g))
  }

  /**
   * Gopher-style repetition statistics, the standard "repetitious
   * text" quality gate (Rae et al. 2021 §A1.1): fraction of distinct
   * tokens, fraction of duplicated word-2-grams, and the share of the
   * single most frequent token. All per-row, inside whole-stage
   * codegen — no token ever leaves its row, which beats exploding
   * 100 TB of tokens through a shuffle by orders of magnitude. The
   * top-token term is a native single-pass hashed count
   * (`TopTokenCount`): linear in document length, so the 100k-token
   * tail of a crawl corpus costs 100k map hits, not the ~10^9 string
   * comparisons of the HOF distinct-x-scan formulation.
   */
  def repetitionStats(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tk = toks(col(textCol))
    val staged = df.select(col(idCol), col(textCol), tk.as("__tk"))
    val n = size(col("__tk")).cast("double")
    val empty = size(col("__tk")) === 0 ||
      (size(col("__tk")) === 1 && col("__tk").getItem(0) === "")
    val distinctRatio = when(empty, lit(0.0))
      .otherwise(size(array_distinct(col("__tk"))) / n)
    val topTok = when(empty, lit(0.0)).otherwise(
      graft.functions.expressions.HashExpressions
        .top_token_count(col("__tk")).cast("double") / n)
    staged.select(col(idCol),
      round(distinctRatio, 4).as("distinct_token_ratio"),
      round(dupNgramFrac(col(textCol), 2), 4).as("dup_2gram_frac"),
      round(topTok, 4).as("top_token_frac"))
  }

  /**
   * Benchmark decontamination: flag documents sharing any word
   * `n`-gram with an evaluation set — the overlap check every
   * training corpus runs before a model ships (GPT-3 appendix C
   * methodology). The benchmark side is small by nature, so its
   * distinct grams BROADCAST and the corpus streams through a
   * broadcast hash join on the exploded (already-deduplicated)
   * doc grams — no shuffle of the 100 TB side.
   * Returns (id, n_hits): distinct contaminated grams per document.
   */
  def decontaminate(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame = {
    // grams compare by 64-bit hash, not string: the broadcast set and
    // the probe keys stay 8 bytes wide. Collisions are vanishing at
    // 64 bits over a benchmark set's ~1e3..1e6 grams; when one does
    // occur it can flag a clean doc or merge two real hits into one
    // count (never MISS a real overlap — true matches always collide)
    val bg = bench
      .select(explode(gramHashes(col(textCol), n)).as("gh")).distinct()
    val dg = docs.select(col(idCol),
      explode(array_distinct(gramHashes(col(textCol), n))).as("gh"))
    dg.join(broadcast(bg), "gh")
      .groupBy(col(idCol))
      .agg(countDistinct(col("gh")).as("n_hits"))
  }

  /**
   * Span-level exact-substring dedup (the duplicated-window pass of
   * "Deduplicating Training Data Makes Language Models Better", Lee
   * et al. 2022, at token-window granularity): hash every `w`-token
   * sliding window, find hashes occurring more than once in the
   * corpus, and report per document how many of its windows are
   * globally duplicated. The 100 TB shape: the exploded windows
   * shuffle ONCE on the window hash, the duplicate flag is a window
   * count over that partitioning (no join, no second corpus pass),
   * and the per-doc rollup shuffles doc ids only — no string
   * comparison ever leaves a row.
   * Returns (id, n_windows, n_dup_windows, dup_frac).
   */
  def spanDedup(df: DataFrame, idCol: String, textCol: String,
      w: Int = 10): DataFrame = {
    // 64-bit window keys: the shuffle carries 8-byte longs, and the
    // oracle only compares duplicate COUNTS (never hash values), so
    // any collision-resistant hash matches it
    val windows = df.select(col(idCol),
      explode(gramHashes(col(textCol), w)).as("whash"))
    // global dup detection as a WINDOW count over whash: the explode
    // runs once, shuffles once on the window hash, and the doc rollup
    // is the only other exchange — no join, no second pass over the
    // corpus. (A pathologically hot boilerplate window concentrates
    // its copies in one task; that is the same skew a groupBy(whash)
    // would see, and salting the hash is the escape hatch.)
    val cnt = count(lit(1)).over(Window.partitionBy(col("whash")))
    windows.withColumn("cnt", cnt)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup_windows"))
      .select(col(idCol), col("n_windows"), col("n_dup_windows"),
        round(col("n_dup_windows") / col("n_windows").cast("double"), 4)
          .as("dup_frac"))
  }

  /**
   * Skew-safe [[spanDedup]]: identical output, built for a corpus where
   * ONE boilerplate window (a shared header/footer) repeats hundreds of
   * millions of times. The plain formulation colocates every copy of a
   * whash in one window-function task — window functions cannot
   * partial-aggregate, so a hot window key serializes. This variant
   * re-aggregates EXACTLY with every group bounded:
   *
   *  1. pre-collapse to (id, whash, k) — group size bounded by DOC
   *     length, never by corpus frequency;
   *  2. whash totals from the collapsed pairs via two-phase hash
   *     aggregation: the map-side partial sums play the salt — a hot
   *     whash reaches the exchange as one partial row per map task;
   *  3. whashes with >= `hotThreshold` occurrences are BY CONSTRUCTION
   *     few (<= total_windows / T — the salting-threshold argument) and
   *     all duplicated, so they resolve through a BROADCAST semi-join;
   *     the anti side keeps hot keys out of the cold equi-join, whose
   *     per-key row count is then < T on both sides.
   *
   * The (id, whash) aggregate feeds totals AND both marked branches, so
   * it is PERSISTED (memory-and-disk): three consumers over one
   * materialization of the collapsed 24-byte rows, instead of exploding
   * the corpus three times — AQE cannot reuse the stages because the
   * broadcast semi/anti pushdown makes each branch's subtree distinct
   * (asserted in PlanAuditSpec). Use when telemetry shows boilerplate
   * hot spots; the plain two-exchange form stays the default.
   */
  def spanDedupSalted(df: DataFrame, idCol: String, textCol: String,
      w: Int = 10, hotThreshold: Long = 100000L): DataFrame = {
    require(hotThreshold >= 2, "hotThreshold must be >= 2 (hot => dup)")
    val windows = df.select(col(idCol),
      explode(gramHashes(col(textCol), w)).as("whash"))
    val perDoc = windows.groupBy(col(idCol), col("whash"))
      .agg(count(lit(1)).as("k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = perDoc.groupBy(col("whash")).agg(sum(col("k")).as("cnt"))
    val hot = totals.filter(col("cnt") >= hotThreshold).select("whash")
    val hotMarked = perDoc
      .join(broadcast(hot), Seq("whash"), "left_semi")
      .withColumn("dup", lit(true)) // threshold >= 2 makes hot => dup
    val coldMarked = perDoc
      .join(broadcast(hot), Seq("whash"), "left_anti")
      .join(totals.filter(col("cnt") < hotThreshold), Seq("whash"))
      .withColumn("dup", col("cnt") > 1).drop("cnt")
    hotMarked.unionByName(coldMarked)
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_windows"),
        sum(when(col("dup"), col("k")).otherwise(0L)).as("n_dup_windows"))
      .select(col(idCol), col("n_windows"), col("n_dup_windows"),
        round(col("n_dup_windows") / col("n_windows").cast("double"), 4)
          .as("dup_frac"))
  }

  private val urlRe = "https?://([A-Za-z0-9.-]+)"

  /** All URL hostnames mentioned in `text` (scheme stripped). */
  def urlDomains(text: Column): Column =
    regexp_extract_all(text, lit(urlRe), lit(1))

  /**
   * Per-domain corpus accounting with a blocklist: explode mentioned
   * domains, drop blocklisted ones, count documents and mentions per
   * domain. One hash-aggregation shuffle on the domain key — the
   * crawl-corpus "who contributes what" report.
   */
  def domainStats(df: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[String]): DataFrame = {
    val dom = df.select(col(idCol),
      explode(urlDomains(col(textCol))).as("domain"))
    val kept = if (blocklist.isEmpty) dom
      else dom.filter(!col("domain").isin(blocklist: _*))
    kept.groupBy(col("domain"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_urls"))
  }

  /**
   * Deterministic temperature-weighted mixture sampling: draw a
   * ~`budget`-document sample whose group shares follow sqrt-smoothed
   * counts (tau = 0.5 "temperature" reweighting — small groups get
   * upsampled relative to their raw share, the standard multilingual
   * mixing step). Per-group keep thresholds use INTEGER arithmetic
   * only (floor(sqrt(n)) of an exact integer is deterministic across
   * engines; everything after is integer mul/div), so membership is
   * a pure function of the id and the oracle matches hash-exactly.
   * One tiny aggregation for the rates (broadcast back), one
   * multiplicative-hash filter over the corpus — no corpus shuffle.
   */
  def mixtureSample(df: DataFrame, idCol: String, groupCol: String,
      budget: Long): DataFrame = {
    // the membership hash is integer arithmetic on the id: a string id
    // would cast to null row-by-row in non-ANSI mode and the filter
    // would silently return an EMPTY sample — misuse must fail loudly
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"mixtureSample: id column '$idCol' must be integral, got " +
          s"$other — hash non-numeric ids first (e.g. xxhash64($idCol))")
    }
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__rt", floor(sqrt(col("__n"))).cast("long"))
    val tot = counts.agg(sum(col("__rt")).as("__srt"))
    // 38-digit decimal arithmetic: at planetary scale (budget·rt·1e4
    // can pass 2^63) a long product would wrap negative in non-ANSI
    // mode and silently drop whole groups; decimals keep the integer
    // division exact and `div` still yields a long
    val thr = counts.crossJoin(broadcast(tot))
      .select(col(groupCol),
        least(lit(10000L),
          expr(s"(cast($budget as decimal(38,0)) * __rt * 10000)" +
            " div (cast(__srt as decimal(38,0)) * __n)")).as("__thr"))
    val h = pmod(pmod(col(idCol), lit(1000000007L)) * 2654435761L,
      lit(1000000007L)) % 10000L
    df.join(broadcast(thr), groupCol)
      .filter(h < col("__thr"))
      .select(col(idCol), col(groupCol))
  }

  /**
   * Token-budget shard packing: assign each document the shard whose
   * token-budget window its START offset falls in (shard = floor of
   * the exclusive prefix sum / budget) — the deterministic,
   * order-preserving way to cut a corpus into ~budget-token training
   * shards.
   *
   * A naive `Window.orderBy(id)` with no partition key collapses all
   * data into ONE task — the classic global-window scale trap. This
   * is the two-level distributed prefix sum instead: range-partition
   * by id, run the running sum per partition, then shift each
   * partition by the total of everything before it (a tiny
   * per-partition offset frame, broadcast back). Two scans, no
   * single-partition sort, works at any scale.
   */
  def packShards(df: DataFrame, idCol: String, weightCol: String,
      budget: Long, numPartitions: Int = 32): DataFrame = {
    val ranged = df.select(col(idCol), col(weightCol))
      .repartitionByRange(numPartitions, col(idCol))
      .withColumn("__pid", spark_partition_id())
    // running sum within each range partition (ordered by id)
    val local = ranged.withColumn("__cum",
      sum(col(weightCol)).over(
        Window.partitionBy(col("__pid")).orderBy(col(idCol))))
    // per-partition totals -> exclusive offsets; numPartitions rows,
    // so the unpartitioned window is trivially cheap and the join
    // side broadcasts
    val offsets = local.groupBy(col("__pid"))
      .agg(sum(col(weightCol)).as("__tot"))
      .withColumn("__off",
        coalesce(sum(col("__tot")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), "__pid")
      .select(col(idCol),
        floor((col("__cum") + col("__off") - col(weightCol))
          .cast("double") / budget.toDouble).cast("long").as("shard_id"))
  }

  /**
   * Sequence packing for pretraining — concat-then-chunk: documents
   * are laid end to end in id order inside one global token stream,
   * which is cut into fixed `seqLen`-token training sequences.
   * Returns one row per (document, sequence) overlap with the slice
   * bounds a gather needs to materialize the sequence:
   * `seq_id`, `doc_from`/`doc_to` (token range within the doc,
   * end-exclusive) and `seq_off` (where the slice starts inside the
   * sequence). A doc spanning several windows emits several rows;
   * empty docs emit none.
   *
   * Scale shape: the SAME two-level distributed prefix sum as
   * [[packShards]] (no global single-task window), then a bounded
   * per-doc `sequence()` explode — a doc emits ceil(tokens/seqLen)+1
   * rows, so output is ~corpus_tokens/seqLen rows regardless of skew.
   * Integer arithmetic throughout (`div`), exact at any corpus size.
   */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      seqLen: Int, numPartitions: Int = 32): DataFrame = {
    require(seqLen > 0, s"packSequences: seqLen $seqLen")
    val ranged = df.select(col(idCol), col(tokenCol).cast("long").as("__n"))
      .repartitionByRange(numPartitions, col(idCol))
      .withColumn("__pid", spark_partition_id())
    val local = ranged.withColumn("__cum",
      sum(col("__n")).over(
        Window.partitionBy(col("__pid")).orderBy(col(idCol))))
    val offsets = local.groupBy(col("__pid"))
      .agg(sum(col("__n")).as("__tot"))
      .withColumn("__off",
        coalesce(sum(col("__tot")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    val started = local.join(broadcast(offsets), "__pid")
      .filter(col("__n") > 0)
      .withColumn("__start", col("__cum") + col("__off") - col("__n"))
    val L = seqLen.toLong
    started
      .withColumn("seq_id", explode(sequence(
        expr(s"__start div $L"), expr(s"(__start + __n - 1) div $L"))))
      .select(col(idCol), col("seq_id"),
        (greatest(col("__start"), col("seq_id") * L) - col("__start"))
          .as("doc_from"),
        (least(col("__start") + col("__n"), (col("seq_id") + 1) * L)
          - col("__start")).as("doc_to"),
        (greatest(col("__start"), col("seq_id") * L) - col("seq_id") * L)
          .as("seq_off"))
  }

  /**
   * Exact-quota stratified sampling: the `quota` deterministically
   * lowest-ranked rows of EVERY stratum (per-language validation
   * splits, eval-set construction). The rank key is integer
   * arithmetic on the id — reproducible across engines and runs, no
   * RNG state — and the result is EXACT: precisely
   * `min(quota, |stratum|)` rows per stratum, unlike the rate-based
   * [[mixtureSample]].
   *
   * Scale shape (100 TB): a naive `row_number() over (partition by
   * stratum order by key)` sorts ENTIRE strata — a web crawl's "en"
   * stratum is tens of TB through a handful of tasks. Instead:
   * (1) per-stratum counts — one tiny aggregate, broadcast back;
   * (2) a hash-cutoff prefilter keeps ~`margin`×quota expected rows
   *     per stratum — the only full-data pass, a codegen'd filter
   *     against a broadcast cutoff map;
   * (3) the exact row_number runs over the surviving ~margin×quota
   *     rows per stratum.
   * The survivor census (bounded: one row per stratum) verifies the
   * prefilter kept at least min(quota, n) everywhere; a stratum the
   * prefilter under-selected — Chernoff-improbable at margin 8, but
   * correctness must not ride on a tail bound — is recomputed
   * WITHOUT the prefilter and unioned back in.
   */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      quota: Int, margin: Int = 8): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"stratifiedSample: id column '$idCol' must be integral, got " +
          s"$other — hash non-numeric ids first (e.g. xxhash64($idCol))")
    }
    require(quota > 0 && margin >= 2, s"quota=$quota margin=$margin")
    val P = 1000000007L
    val h = pmod(pmod(col(idCol), lit(P)) * 2654435761L, lit(P))
    val keyed = df.select(col(idCol), col(stratumCol), h.as("__h"))
    val counts = keyed.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"))
    // cutoff: keep everything when the stratum is small; otherwise an
    // expected margin×quota rows (quota·margin·P stays far below 2^63
    // for any sane quota — 10^9 × quota·margin)
    val cuts = counts.select(col(stratumCol),
      when(col("__n") <= lit(quota.toLong * margin), lit(P))
        .otherwise(expr(s"${quota.toLong * margin}L * ${P}L div __n") + 1)
        .as("__cut"))
    // null-safe (<=>) joins throughout: a NULL stratum is a legal SQL
    // GROUP BY group (same contract as exactQuantilesByGroup) — a
    // name-based equi-join would silently drop its rows
    val cutsR = cuts.withColumnRenamed(stratumCol, "__s")
    val surv = keyed.join(broadcast(cutsR), col(stratumCol) <=> col("__s"))
      .filter(col("__h") < col("__cut"))
      .drop("__s", "__cut")
    // bounded driver check: one row per stratum, never data-scale
    val gotR = surv.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__g"))
      .withColumnRenamed(stratumCol, "__s")
    val deficient = counts
      .join(gotR, col(stratumCol) <=> col("__s"), "left")
      .filter(coalesce(col("__g"), lit(0L)) <
        least(lit(quota.toLong), col("__n")))
      .select(col(stratumCol)).collect().map(_.get(0)).toSeq
    val defNonNull = deficient.filter(_ != null)
    val defHasNull = deficient.exists(_ == null)
    def inDeficient(c: Column): Column = {
      val nn = if (defNonNull.nonEmpty) c.isin(defNonNull: _*) else lit(false)
      // isin(null input) yields NULL — coalesce so !inDeficient keeps
      // a null stratum that is NOT deficient
      coalesce(if (defHasNull) nn || c.isNull else nn, lit(false))
    }
    val base =
      if (deficient.isEmpty) surv.select(col(idCol), col(stratumCol), col("__h"))
      else surv.filter(!inDeficient(col(stratumCol)))
        .select(col(idCol), col(stratumCol), col("__h"))
        .unionByName(keyed.filter(inDeficient(col(stratumCol))))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("__h"), col(idCol))
    base.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= quota)
      .select(col(idCol), col(stratumCol), col("rk"))
  }

  /**
   * Deterministic weighted sampling WITHOUT replacement — pick k rows
   * with inclusion probability proportional to `weightCol` (quality
   * scores, token counts, domain boosts): the training-mixture
   * primitive behind "sample 10M docs, favoring high quality".
   *
   * Exponential-race formulation of Efraimidis–Spirakis A-ES: each
   * row draws u ∈ (0,1) and races with key = w / (-ln u) — a monotone
   * transform of the classic u^(1/w), so the top-k by key IS the A-ES
   * sample — and the k largest keys win. One keyed scan into a top-k
   * (`TakeOrderedAndProject`): per-partition k-heaps, k rows to the
   * driver side of the exchange, no full sort, no shuffle of data —
   * the same plan shape at 100 TB.
   *
   * Deterministic BY CONSTRUCTION, not by seed-capture: u derives
   * from an LCG over the integral id
   * (h = ((id mod P)·1103515245 + 12345) mod P; u = (h+0.5)/P) in
   * exact integer arithmetic, so reruns, retries and the DuckDB
   * oracle reproduce the identical sample. The key is rounded to 6
   * decimals before ranking (ties then break by id) so the orderings
   * agree across ln() implementations.
   *
   * Zero weights get key 0 and negative weights negative keys — both
   * lose the race to every positive weight, so they are only ever
   * selected when k exceeds the positive-weight row count.
   *
   * @return (id, weight, rk) — the k winners ranked best-first
   */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long = 12345L): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"weightedSample: id column '$idCol' must be integral, got " +
          s"$other — hash non-numeric ids first (e.g. xxhash64($idCol))")
    }
    require(k >= 1, s"k must be positive, got $k")
    val P = 2147483647L // 2^31-1: (P-1)*1103515245 < 2^62, no overflow
    val h = pmod(pmod(col(idCol), lit(P)) * 1103515245L + lit(seed),
      lit(P))
    val u = (h.cast("double") + 0.5) / P.toDouble
    val key = round(col("__w").cast("double") / -log(u), 6)
    df.select(col(idCol), col(weightCol).as("__w"))
      .withColumn("__key", key)
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__key").desc, col(idCol))).cast("long"))
      .select(col(idCol), col("__w").as(weightCol), col("rk"))
  }

  /**
   * Per-group deterministic weighted sampling — quota rows per group
   * (per language, per domain), inclusion proportional to weight
   * WITHIN each group: the mixture primitive "take the best-quality
   * 10k docs per language, favoring — not hard-ranking by — quality".
   *
   * Same exponential race as [[weightedSample]] (identical LCG
   * uniform and 6-decimal key, so the two compose reproducibly), but
   * the per-group top-quota runs through [[GroupTopK]]'s BOUNDED
   * buffer: partial aggregation caps every (group × partition)
   * contribution at `quota` pairs before the shuffle. The window
   * formulation (`row_number() over (partition by g order by key)`)
   * would sort every group's full row set through the exchange; here
   * a billion-row language ships quota × partitions pairs.
   *
   * @return (group, id, rk) winners, rk 1..quota best-first per group
   */
  def weightedSampleByGroup(df: DataFrame, idCol: String,
      groupCol: String, weightCol: String, quota: Int,
      seed: Long = 12345L): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"weightedSampleByGroup: id column '$idCol' must be integral, " +
          s"got $other — hash non-numeric ids first")
    }
    require(quota >= 1, s"quota must be positive, got $quota")
    val P = 2147483647L
    val h = pmod(pmod(col(idCol), lit(P)) * 1103515245L + lit(seed),
      lit(P))
    val u = (h.cast("double") + 0.5) / P.toDouble
    val key = round(col(weightCol).cast("double") / -log(u), 6)
    df.select(col(groupCol), col(idCol), key.as("__key"))
      .groupBy(col(groupCol))
      .agg(graft.functions.GroupTopK.topk(quota)(
        col("__key"), col(idCol)).as("__top"))
      .select(col(groupCol), posexplode(col("__top")))
      .select(col(groupCol), col("col._1").as(idCol),
        (col("pos") + 1).cast("long").as("rk"))
  }

  /**
   * Corpus snapshot diff — row-level change accounting between two
   * versions of a corpus: `added` (new only), `removed` (old only),
   * `changed` (both, content hash differs), `unchanged`. The audit
   * primitive behind "what did this recrawl/refilter actually do",
   * and the input to incremental re-processing (re-embed only
   * added ∪ changed).
   *
   * Shape at 100 TB: content comparison travels as a fixed-width
   * md5, never the text; the full-outer join shuffles both sides
   * hash-partitioned on id (both sides are data-scale, so there is
   * genuinely nothing to broadcast — AQE handles skew). One shuffle
   * each side, no driver state.
   */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as(idCol), md5(col(textCol)).as("__oh"))
    val n = newDf.select(col(idCol).as(idCol), md5(col(textCol)).as("__nh"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__oh").isNull, lit("added"))
          .when(col("__nh").isNull, lit("removed"))
          .when(col("__oh") === col("__nh"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /**
   * Leakage-free train/validation/test split: every document in a
   * duplicate CLUSTER lands on the same side, so near-identical text
   * can never sit in train while its twin sits in eval — the
   * correctness property a random per-document split silently
   * violates on any deduplicated-in-name-only corpus.
   *
   * The caller supplies the cluster assignment (exact-dup canonical
   * ids, [[Dedup.connectedComponents]] cluster ids, domain hashes —
   * any id-typed grouping); the split decision is a pure LCG over
   * the CLUSTER id (exact integer arithmetic, same generator as
   * [[weightedSample]]), so it is deterministic, reproducible, and
   * oracle-replayable, and adding documents to a cluster NEVER moves
   * existing ones across splits (stability under corpus growth).
   *
   * Row-local after the cluster join: no shuffle beyond the one that
   * attaches cluster ids, no driver state. Fractions are permille
   * thresholds on the LCG value — exact, not floating-point.
   *
   * @param clusters (docIdCol, clusterCol) mapping, one row per doc
   * @param trainPm  permille of clusters routed to "train"
   * @param validPm  permille routed to "valid" (rest is "test")
   * @return (docIdCol, clusterCol, split)
   */
  def leakFreeSplit(clusters: DataFrame, docIdCol: String,
      clusterCol: String, trainPm: Int = 800, validPm: Int = 100,
      seed: Long = 12345L): DataFrame = {
    require(trainPm >= 0 && validPm >= 0 && trainPm + validPm <= 1000,
      s"permille fractions out of range: train=$trainPm valid=$validPm")
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    clusters.schema(clusterCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"leakFreeSplit: cluster column '$clusterCol' must be " +
          s"integral, got $other — hash non-numeric keys first")
    }
    val P = 2147483647L
    val h = pmod(pmod(col(clusterCol), lit(P)) * 1103515245L +
      lit(seed), lit(P))
    val pm = (h % 1000L).cast("int")
    clusters.select(col(docIdCol), col(clusterCol),
      when(pm < trainPm, lit("train"))
        .when(pm < trainPm + validPm, lit("valid"))
        .otherwise(lit("test")).as("split"))
  }

  /**
   * Cross-document boilerplate line removal (the C4/MassiveText line
   * filter): a line whose trimmed form appears in at least `minDocs`
   * DISTINCT documents is boilerplate ("all rights reserved",
   * cookie banners, nav menus) and is stripped from every document;
   * trimmed-empty lines are structure, never counted and never
   * removed. Every input document survives — a fully-boilerplate
   * document comes back with empty text, it does not vanish (the
   * downstream gate decides its fate, not this operator).
   *
   * Scale shape: one explode, ONE count shuffle on the line hash,
   * then an anti-join against the boilerplate table — deliberately
   * NOT force-broadcast: the table is small by construction (the
   * threshold keeps only lines repeated across ≥ minDocs docs), so
   * AQE converts the join to broadcast at runtime from its REAL size,
   * but a pathological corpus (minDocs=2 over templated text) can
   * produce a data-scale set, and a forced broadcast would OOM the
   * driver exactly there. Then ONE reassembly shuffle on the doc id;
   * per-doc state is bounded by document size (collect_list of its
   * own lines), never by corpus size.
   *
   * @return (idCol, textCol) with boilerplate lines removed,
   *         remaining lines in original order
   */
  def stripBoilerplateLines(df: DataFrame, idCol: String,
      textCol: String, minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = df.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__norm", trim(col("__line")))
    val boiler = lines.filter(col("__norm") =!= "")
      .groupBy(col("__norm"))
      .agg(count_distinct(col(idCol)).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select("__norm")
    val kept = lines.join(boiler, Seq("__norm"), "left_anti")
    df.select(col(idCol)).distinct()
      .join(kept, Seq(idCol), "left")
      .groupBy(col(idCol))
      .agg(coalesce(
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s("__line")), "\n"),
        lit("")).as(textCol))
  }

  /**
   * Overlapping token-window chunking (context-window preparation for
   * embedding / retrieval pipelines): each document's whitespace
   * tokens split into windows of `chunk` tokens advancing by
   * `chunk - overlap`, the last window carrying the tail (possibly
   * fewer than `chunk` tokens). Empty documents emit no chunks.
   *
   * Entirely ROW-LOCAL — split/sequence/slice/array_join are codegen
   * HOFs, so the operator adds zero shuffles to whatever partitioning
   * the corpus already has; at 100 TB it runs at scan speed.
   *
   * @return (idCol, chunk_id, chunk_text, n_tokens), chunk_id 0-based
   */
  def chunkOverlap(df: DataFrame, idCol: String, textCol: String,
      chunk: Int, overlap: Int): DataFrame = {
    require(chunk > 0 && overlap >= 0 && overlap < chunk,
      s"need 0 <= overlap < chunk, got chunk=$chunk overlap=$overlap")
    val step = chunk - overlap
    // \s+, not a literal space: tab- or newline-separated text must
    // tokenize, not glue multi-word tokens into one
    val toks = filter(split(col(textCol), "\\s+"), x => x =!= "")
    val n = size(toks)
    // last window start: ceil((n - chunk) / step); the double cast is
    // exact for any token count an array can hold
    val kMax = when(n <= chunk, lit(0))
      .otherwise(floor((n - chunk + step - 1).cast("double") / step)
        .cast("int"))
    df.select(col(idCol), toks.as("__tk"), n.as("__n"), kMax.as("__k"))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__tk"), col("__n"),
        posexplode(sequence(lit(0), col("__k"))).as(Seq("__cid", "__i")))
      .select(col(idCol),
        col("__cid").cast("long").as("chunk_id"),
        array_join(slice(col("__tk"), col("__i") * step + 1, lit(chunk)),
          " ").as("chunk_text"),
        least(lit(chunk), col("__n") - col("__i") * step).cast("long")
          .as("n_tokens"))
  }
}
