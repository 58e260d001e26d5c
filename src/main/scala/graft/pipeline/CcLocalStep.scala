package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter
import org.apache.spark.util.LongAccumulator

/**
 * Primitive-layout union-find over one partition's (a, b) vertex-pair
 * rows — the per-level local step of
 * [[Dedup.connectedComponents]]'s contract-and-iterate algorithm.
 *
 * Everything here is flat long/int arrays (open addressing, path
 * halving): no per-row objects, no boxing, no Scala collections in
 * the hot loop — the guide-§5 fix for the old DataFrame round loop,
 * whose 100x-replica replay spent 459 s of task GC folding 60M-row
 * label frames through per-round join/aggregate objects.
 *
 * Emitted rows are (vertex, root) pairs — root = the minimum vertex
 * id of the vertex's LOCAL component — one per non-root local vertex,
 * as fresh fixed-width UnsafeRow copies. The `changed` accumulator
 * counts emitted pairs that were NOT present (in either direction)
 * among the partition's input pairs: a level where every partition
 * emits only seen pairs has globally reproduced its input star
 * forest, which is the loop's fixpoint witness (see the proof sketch
 * on [[Dedup.connectedComponents]]).
 */
private[graft] object CcLocalStep {

  def process(rows: Iterator[InternalRow],
      changed: LongAccumulator): Iterator[InternalRow] = {
    val uf = new LongMinUnionFind()
    val seen = new LongPairSet()
    while (rows.hasNext) {
      val r = rows.next()
      val a = r.getLong(0)
      val b = r.getLong(1)
      if (a != b) {
        uf.union(a, b)
        seen.add(a, b)
      } else uf.register(a) // self-loop: the vertex exists, no edge
    }
    val n = uf.size
    val writer = new UnsafeRowWriter(2)
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = {
        while (i < n && uf.rootOf(i) == i) i += 1 // roots emit nothing
        i < n
      }
      override def next(): InternalRow = {
        val k = uf.keyOf(i)
        val rk = uf.keyOf(uf.rootOf(i))
        if (!seen.contains(k, rk)) changed.add(1L)
        writer.reset()
        writer.write(0, k)
        writer.write(1, rk)
        i += 1
        writer.getRow.copy()
      }
    }
  }
}

/** Union-find keyed by long vertex ids with MIN-ID roots: uniting two
  * components makes the smaller-keyed root the parent, so every root
  * is by induction the minimum id of its component. Open-addressing
  * long->slot table + dense parent array, path halving on find. */
private[graft] final class LongMinUnionFind(initialCap: Int = 1 << 12) {
  private var tcap = Integer.highestOneBit(math.max(16, initialCap)) << 1
  private var table = {
    val t = new Array[Int](tcap); java.util.Arrays.fill(t, -1); t
  }
  private var keys = new Array[Long](tcap >> 1)
  private var parent = new Array[Int](tcap >> 1)
  private var n = 0

  private def mix(k: Long): Int = {
    var h = k * -7046029254386353131L
    h ^= h >>> 32
    (h ^ (h >>> 16)).toInt
  }

  /** Slot of `k`, inserting a fresh singleton if absent. */
  def register(k: Long): Int = {
    val mask = tcap - 1
    var idx = mix(k) & mask
    var s = table(idx)
    while (s != -1) {
      if (keys(s) == k) return s
      idx = (idx + 1) & mask
      s = table(idx)
    }
    if (n >= keys.length) { grow(); return register(k) }
    keys(n) = k
    parent(n) = n
    table(idx) = n
    n += 1
    n - 1
  }

  private def grow(): Unit = {
    tcap <<= 1
    val t = new Array[Int](tcap)
    java.util.Arrays.fill(t, -1)
    keys = java.util.Arrays.copyOf(keys, tcap >> 1)
    parent = java.util.Arrays.copyOf(parent, tcap >> 1)
    val mask = tcap - 1
    var s = 0
    while (s < n) {
      var idx = mix(keys(s)) & mask
      while (t(idx) != -1) idx = (idx + 1) & mask
      t(idx) = s
      s += 1
    }
    table = t
  }

  /** Root slot with path halving. */
  def find(i0: Int): Int = {
    var i = i0
    while (parent(i) != i) {
      parent(i) = parent(parent(i))
      i = parent(i)
    }
    i
  }

  def union(a: Long, b: Long): Unit = {
    val ra = find(register(a))
    val rb = find(register(b))
    if (ra != rb) {
      if (keys(ra) < keys(rb)) parent(rb) = ra
      else parent(ra) = rb
    }
  }

  def size: Int = n
  def keyOf(i: Int): Long = keys(i)
  def rootOf(i: Int): Int = find(i)
}

/** Open-addressing set of UNDIRECTED long pairs (canonicalized to
  * (min, max) internally). Slot-empty marker: lo == hi, which no
  * stored pair can have — callers never add self-pairs. */
private[graft] final class LongPairSet(initialCap: Int = 1 << 12) {
  private var cap = Integer.highestOneBit(math.max(16, initialCap)) << 1
  private var los = new Array[Long](cap)
  private var his = new Array[Long](cap)
  private var n = 0

  private def mix(a: Long, b: Long): Int = {
    var h = a * -7046029254386353131L + b * -4417276706812531889L
    h ^= h >>> 32
    (h ^ (h >>> 16)).toInt
  }

  def add(a: Long, b: Long): Unit = {
    require(a != b, "self-pairs are never stored")
    val lo = math.min(a, b); val hi = math.max(a, b)
    val mask = cap - 1
    var idx = mix(lo, hi) & mask
    while (los(idx) != his(idx)) {
      if (los(idx) == lo && his(idx) == hi) return
      idx = (idx + 1) & mask
    }
    los(idx) = lo; his(idx) = hi
    n += 1
    if (n * 2 >= cap) grow()
  }

  private def grow(): Unit = {
    val oldLos = los; val oldHis = his; val oldCap = cap
    cap <<= 1
    los = new Array[Long](cap)
    his = new Array[Long](cap)
    val mask = cap - 1
    var i = 0
    while (i < oldCap) {
      if (oldLos(i) != oldHis(i)) {
        var idx = mix(oldLos(i), oldHis(i)) & mask
        while (los(idx) != his(idx)) idx = (idx + 1) & mask
        los(idx) = oldLos(i); his(idx) = oldHis(i)
      }
      i += 1
    }
  }

  def contains(a: Long, b: Long): Boolean = {
    if (a == b) return false
    val lo = math.min(a, b); val hi = math.max(a, b)
    val mask = cap - 1
    var idx = mix(lo, hi) & mask
    while (los(idx) != his(idx)) {
      if (los(idx) == lo && his(idx) == hi) return true
      idx = (idx + 1) & mask
    }
    false
  }

  def size: Int = n
}
