package graft.functions

import java.util.{ArrayList => JArrayList, HashMap => JHashMap, LinkedHashMap => JLinkedHashMap}

/**
 * Byte-pair-encoding tokenizer TRAINING and ENCODING — the tokenizer-
 * construction step of a training-data pipeline (the reference engine
 * stops at array reductions; a corpus engine needs to learn the vocab
 * it will count tokens with).
 *
 * Scale shape (mirrors the k-means/IVF "bounded driver fit" pattern in
 * `pipeline/Similarity.scala`):
 *  - the WORD HISTOGRAM is distributed (explode -> groupBy -> count;
 *    map-side partial aggregation collapses the Zipf head before the
 *    exchange), and the driver collects only the top-`maxWords` rows
 *    via TakeOrdered (k-heap, never a full sort);
 *  - MERGE LEARNING runs on that bounded histogram on the driver —
 *    O(maxWords * wordLen * numMerges), independent of corpus size.
 *    This is how production tokenizer trainers work: the corpus
 *    contributes only word counts, the merge loop never rescans it;
 *  - ENCODING is distributed and codegen'd: `BpeEncodeWords` ships the
 *    learned pair->rank table as ONE broadcast-like constant reference
 *    object and encodes each row inside whole-stage codegen. A
 *    per-thread LRU memo makes repeated words (the Zipf mass) a hash
 *    lookup instead of a re-merge.
 *
 * Determinism: merge selection breaks count ties lexicographically on
 * (left, right), so the learned table is identical across partition
 * counts and runs — required for the hash-compared oracle rows.
 *
 * Pairs are keyed as (left, right) TUPLES, never as a separator-joined
 * string: a joined key is ambiguous the moment a symbol contains the
 * separator character (binary junk survives the whitespace tokenizer),
 * which would corrupt the census split and collide distinct pairs in
 * the rank table. For separator-free symbols the tuple order equals
 * the old joined order, so learned tables are unchanged.
 */
object Bpe {

  /** One learned merge: `left`+`right` fuse into one symbol at `rank`
    * (0 = first/highest-priority merge); `n` is the weighted pair count
    * at selection time. */
  final case class Merge(rank: Int, left: String, right: String, n: Long)

  /** End-of-word marker symbol (Sennrich et al. 2016): appended as a
    * word-final symbol so merges can learn word-boundary-aware units
    * and a decoder can restore word boundaries from a flat token
    * stream. Always word-final, so any token containing it ENDS with
    * it. In plain (code-point) mode the classic "</w>" is ambiguous
    * against content that literally contains it — the documented
    * Sennrich limitation. */
  val EOW = "</w>"

  /** Byte-level mode uses a marker OUTSIDE the byte alphabet instead:
    * every content symbol there is one char from the 256-entry
    * bijection (max U+0143), so a private-use char can never be
    * assembled from content by merges — decode(encode(x)) stays exact
    * even for text that literally contains "</w>". */
  val EowByte = "\uE000"

  /** GPT-2's byte<->printable-unicode bijection: the printable ASCII
    * and Latin-1 ranges map to themselves, every other byte to
    * U+0100+n — so arbitrary UTF-8 (emoji, CJK, binary junk) becomes a
    * string of 256 distinct single-char symbols the merge loop can
    * treat uniformly, and decoding is exact byte recovery. Built from
    * the published algorithm (encoder.py `bytes_to_unicode`), not any
    * model's vocab file. */
  val byteEncoder: Array[Char] = {
    val self = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val arr = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (self(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    arr
  }
  private val byteDecoder: JHashMap[Character, java.lang.Byte] = {
    val m = new JHashMap[Character, java.lang.Byte](512)
    var b = 0
    while (b < 256) { m.put(byteEncoder(b), b.toByte); b += 1 }
    m
  }

  /** Map a word to its byte-level symbol string (one mapped char per
    * UTF-8 byte). */
  def toByteSymbols(w: String): String = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val chars = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) {
      chars(i) = byteEncoder(bytes(i) & 0xff)
      i += 1
    }
    new String(chars)
  }

  /** Exact inverse of [[toByteSymbols]] over a symbol string. */
  def fromByteSymbols(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val b = byteDecoder.get(s.charAt(i))
      require(b != null, s"not a byte-level symbol: '${s.charAt(i)}'")
      bytes(i) = b
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Split a word into its initial symbols: code points (surrogate
    * pairs never split), or single byte-level symbols when
    * `byteLevel`; `endOfWord` appends the [[EOW]] marker as its own
    * word-final symbol. Empty words stay empty (blank docs encode to
    * zero tokens, the tokenCount contract). */
  private def toSymbols(w: String, byteLevel: Boolean,
      endOfWord: Boolean): JArrayList[String] = {
    val out = new JArrayList[String](w.length + 1)
    if (w.isEmpty) return out
    if (byteLevel) {
      val s = toByteSymbols(w)
      var i = 0
      while (i < s.length) {
        out.add(s.substring(i, i + 1))
        i += 1
      }
    } else {
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        out.add(w.substring(i, i + n))
        i += n
      }
    }
    if (endOfWord) out.add(if (byteLevel) EowByte else EOW)
    out
  }

  /**
   * Learn `numMerges` merges from a (word, count) histogram. Stops
   * early when the best remaining pair occurs fewer than `minCount`
   * times (merging singletons adds vocab without compression).
   *
   * Driver-side by design — callers bound `hist` (see
   * `TextAnalysis.bpeLearn`). Naive full recount per iteration keeps
   * the code auditable; at the 64k-word / 512-merge bound that is
   * ~10^8 cheap operations, irrelevant next to any cluster job.
   */
  def train(hist: Seq[(String, Long)], numMerges: Int,
      minCount: Long = 2L, byteLevel: Boolean = false,
      endOfWord: Boolean = false): Array[Merge] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val words = hist.iterator
      .map { case (w, _) => toSymbols(w, byteLevel, endOfWord) }.toArray
    val counts = hist.iterator.map(_._2).toArray
    val merges = Array.newBuilder[Merge]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      // weighted adjacent-pair census over the current segmentation
      val pc = new JHashMap[(String, String), Long]
      var wi = 0
      while (wi < words.length) {
        val syms = words(wi)
        val c = counts(wi)
        var i = 0
        while (i < syms.size - 1) {
          pc.merge((syms.get(i), syms.get(i + 1)), c,
            (a: Long, b: Long) => a + b)
          i += 1
        }
        wi += 1
      }
      // deterministic argmax: count desc, then (left, right) asc —
      // explicit comparison, never map iteration order
      var bestKey: (String, String) = null
      var bestN = 0L
      val it = pc.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey
        val n = e.getValue
        val wins = n > bestN || (n == bestN && (bestKey == null ||
          k._1 < bestKey._1 ||
          (k._1 == bestKey._1 && k._2 < bestKey._2)))
        if (wins) { bestKey = k; bestN = n }
      }
      if (bestKey == null || bestN < minCount) done = true
      else {
        val left = bestKey._1
        val right = bestKey._2
        merges += Merge(r, left, right, bestN)
        val fused = left + right
        // apply to every word: leftmost-first, non-overlapping
        wi = 0
        while (wi < words.length) {
          val syms = words(wi)
          if (syms.size >= 2) {
            var i = 0
            while (i < syms.size - 1) {
              if (syms.get(i) == left && syms.get(i + 1) == right) {
                syms.set(i, fused)
                syms.remove(i + 1)
              } else i += 1
            }
          }
          wi += 1
        }
        r += 1
      }
    }
    merges.result()
  }

  /**
   * Learned merge table + encoder. The pair->rank map is immutable
   * after construction; the per-THREAD memo (bounded LRU) makes the
   * Zipf head of any real corpus a single hash probe per word. Safe as
   * a codegen reference object shared across tasks.
   */
  final class BpeTable(merges: Array[Merge],
      val byteLevel: Boolean = false,
      val endOfWord: Boolean = false) extends Serializable {
    private val ranks = {
      val m = new JHashMap[(String, String), Integer](merges.length * 2)
      merges.foreach(mg => m.put((mg.left, mg.right), mg.rank))
      m
    }

    @transient private lazy val memo =
      new ThreadLocal[JLinkedHashMap[String, Array[String]]] {
        override def initialValue() =
          new JLinkedHashMap[String, Array[String]](1024, 0.75f, true) {
            override def removeEldestEntry(
                e: java.util.Map.Entry[String, Array[String]]): Boolean =
              size() > 65536
          }
      }

    /** Encode one word: repeatedly fuse the present pair with the
      * LOWEST rank (merge priority), all occurrences leftmost-first per
      * pass — the standard BPE apply order, matching `train`. */
    def encodeWord(word: String): Array[String] = {
      if (word.isEmpty) return Array.empty
      val cached = memo.get().get(word)
      if (cached != null) return cached
      val syms = toSymbols(word, byteLevel, endOfWord)
      var run = syms.size >= 2
      while (run) {
        var bestRank = Int.MaxValue
        var bi = -1
        var i = 0
        while (i < syms.size - 1) {
          val r = ranks.get((syms.get(i), syms.get(i + 1)))
          if (r != null && r < bestRank) { bestRank = r; bi = i }
          i += 1
        }
        if (bi < 0) run = false
        else {
          val left = syms.get(bi)
          val right = syms.get(bi + 1)
          val fused = left + right
          i = 0
          while (i < syms.size - 1) {
            if (syms.get(i) == left && syms.get(i + 1) == right) {
              syms.set(i, fused)
              syms.remove(i + 1)
            } else i += 1
          }
          run = syms.size >= 2
        }
      }
      val out = syms.toArray(new Array[String](syms.size))
      memo.get().put(word, out)
      out
    }

    /** Exact inverse of encoding a whitespace-tokenized document:
      * [[EOW]]-terminated tokens close a word (boundaries restored with
      * single spaces), byte-level symbols map back to their original
      * bytes. Without `endOfWord` the boundaries are gone — tokens
      * concatenate into one run, the pre-marker behavior. */
    def decode(tokens: Iterator[String]): String = {
      val marker = if (byteLevel) EowByte else EOW
      val doc = new java.lang.StringBuilder
      val word = new java.lang.StringBuilder
      def flush(): Unit = if (word.length > 0) {
        if (doc.length > 0) doc.append(' ')
        doc.append(
          if (byteLevel) fromByteSymbols(word.toString) else word.toString)
        word.setLength(0)
      }
      while (tokens.hasNext) {
        val t = tokens.next()
        if (endOfWord && t.endsWith(marker)) {
          word.append(t, 0, t.length - marker.length)
          flush()
        } else word.append(t)
      }
      flush()
      doc.toString
    }
  }
}
