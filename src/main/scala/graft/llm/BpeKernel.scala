package graft.llm

import scala.collection.mutable
import org.apache.spark.unsafe.types.UTF8String

/** Exact single-process BPE trainer over an AGGREGATED word-type table —
  * the fast path of [[Bpe.train]] when the type table is driver-bounded
  * (the codebook adjudication: tokenizer training state, like centroid
  * codebooks and merge tables, is vocab-scale, not corpus-scale). This is
  * the classic incremental algorithm every production tokenizer trainer
  * runs (Sennrich's reference implementation, HF tokenizers,
  * SentencePiece): pair counts and a pair→words index maintained under
  * each merge, a lazy-invalidation heap for the argmax — per merge, work
  * proportional to the words actually CONTAINING the winning pair, so
  * 32k-64k merges cost near one pass over total symbol positions instead
  * of 32k-64k vocab-sized recount jobs.
  *
  * Bit-compatible with the distributed loop's determinism contract:
  * initial symbols are the UTF-16 code units of `split(w, "")` (surrogate
  * halves split, exactly like the distributed form), and the argmax
  * maximizes summed word frequency with ties broken (count DESC, left
  * ASC, right ASC) in BINARY (UTF-8 byte) string order — symbol
  * comparisons go through [[UTF8String]] precisely because Java's UTF-16
  * `String.compareTo` disagrees with Spark/DuckDB binary order on
  * supplementary characters. BpeSpec pins kernel ≡ distributed on
  * goldens, adversarial fixtures, randomized corpora, and the real
  * corpus; bp3's DuckDB oracle hash-gates it per round.
  *
  * Memory/speed shape (the inner loops run hundreds of millions of times
  * at 10⁷ word types): unboxed int postings, an open-addressing
  * long→long pair-count table, and per-word deltas via two sorted
  * primitive pair arrays — no boxed collections anywhere hot.
  */
private[llm] object BpeKernel {

  /** Growable int vector (unboxed — pair→words postings are the bulk of
    * kernel memory; a boxed buffer would be ~6× the bytes). */
  private final class IntVec {
    var arr = new Array[Int](4)
    var n = 0
    def add(x: Int): Unit = {
      if (n == arr.length) arr = java.util.Arrays.copyOf(arr, n * 2)
      arr(n) = x; n += 1
    }
    def last: Int = arr(n - 1)
    def isEmpty: Boolean = n == 0
  }

  /** Open-addressing long→long map (linear probing, power-of-2 capacity,
    * 0-count entries kept as tombstone-free dead weight — distinct pairs
    * ever seen is vocab-scale and bounded). Key 0 is reserved: packed
    * pair keys are never 0 because symbol id 0 exists but pack(0,0) = 0
    * — so ids start at 1. */
  private final class LongLongMap(initialCap: Int) {
    private var cap = Integer.highestOneBit(math.max(16, initialCap) * 2)
    private var mask = cap - 1
    private var keys = new Array[Long](cap)
    private var vals = new Array[Long](cap)
    private var used = 0
    def get(k: Long): Long = {
      var i = (java.lang.Long.hashCode(k * 0x9e3779b97f4a7c15L)) & mask
      while (true) {
        val kk = keys(i)
        if (kk == k) return vals(i)
        if (kk == 0L) return 0L
        i = (i + 1) & mask
      }
      0L
    }
    def put(k: Long, v: Long): Unit = {
      var i = (java.lang.Long.hashCode(k * 0x9e3779b97f4a7c15L)) & mask
      while (true) {
        val kk = keys(i)
        if (kk == k) { vals(i) = v; return }
        if (kk == 0L) {
          keys(i) = k; vals(i) = v; used += 1
          if (used * 4 > cap * 3) grow()
          return
        }
        i = (i + 1) & mask
      }
    }
    private def grow(): Unit = {
      val ok = keys; val ov = vals
      cap *= 2; mask = cap - 1; used = 0
      keys = new Array[Long](cap); vals = new Array[Long](cap)
      var i = 0
      while (i < ok.length) {
        if (ok(i) != 0L) put(ok(i), ov(i))
        i += 1
      }
    }
  }

  private def pack(l: Int, r: Int): Long = (l.toLong << 32) | (r.toLong & 0xffffffffL)

  /** `types`: one row per distinct word (already lowercased, tokenized,
    * and frequency-aggregated) as (word, frequency); initial symbols are
    * the word's UTF-16 code units. Returns (rank, left, right, cnt). */
  def train(types: Array[(String, Long)], numMerges: Int,
      minPairCount: Long): Seq[(Int, String, String, Long)] = {
    // symbol interning: ids start at 1 (see LongLongMap's reserved key);
    // single chars go through a flat char table, merged symbols through
    // the map
    val syms2id = mutable.HashMap.empty[String, Int]
    val idSyms = mutable.ArrayBuffer.empty[String]
    val idU8 = mutable.ArrayBuffer.empty[UTF8String]
    idSyms += ""; idU8 += UTF8String.EMPTY_UTF8 // id 0: reserved
    def intern(s: String): Int = syms2id.getOrElseUpdate(s, {
      idSyms += s; idU8 += UTF8String.fromString(s); idSyms.length - 1
    })
    val charId = new Array[Int](65536)

    val nW = types.length
    val words = new Array[Array[Int]](nW)
    val freqs = new Array[Long](nW)
    var totalPos = 0L
    val pairCounts = new LongLongMap(1 << 16)
    val pairWords = mutable.HashMap.empty[Long, IntVec]

    // heap of (cnt, l, r) snapshots, lazily invalidated against
    // pairCounts on pop; ordering = the argmax contract
    val ord = new Ordering[(Long, Int, Int)] {
      def compare(a: (Long, Int, Int), b: (Long, Int, Int)): Int = {
        if (a._1 != b._1) return java.lang.Long.compare(b._1, a._1) // cnt DESC
        val cl = idU8(a._2).compareTo(idU8(b._2)) // left ASC, binary
        if (cl != 0) return cl
        idU8(a._3).compareTo(idU8(b._3)) // right ASC, binary
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, Int, Int)](ord.reverse)

    // heap pushes are DEFERRED and deduplicated: occurrence-level bumps
    // hit only the primitive count map (hundreds of millions of them at
    // scale — a push per bump was the measured kernel wall), and each
    // DISTINCT dirty pair pushes once per iteration with its settled
    // count (dirtyStamp: pair → iteration, reusing the map's reserved-0
    // convention via stamp ids ≥ 1)
    val dirtyStamp = new LongLongMap(1 << 16)
    var dirty = new Array[Long](1 << 12)
    var nDirty = 0
    var stamp = 1L
    def bump(p: Long, delta: Long): Unit = {
      pairCounts.put(p, math.max(pairCounts.get(p) + delta, 0L))
      if (dirtyStamp.get(p) != stamp) {
        dirtyStamp.put(p, stamp)
        if (nDirty == dirty.length) dirty = java.util.Arrays.copyOf(dirty, nDirty * 2)
        dirty(nDirty) = p; nDirty += 1
      }
    }
    def flushDirty(): Unit = {
      var i = 0
      while (i < nDirty) {
        val p = dirty(i)
        val c = pairCounts.get(p)
        if (c > 0L) heap.enqueue((c, (p >>> 32).toInt, p.toInt))
        i += 1
      }
      nDirty = 0
      stamp += 1
    }

    var w = 0
    while (w < nW) {
      val (s, f) = types(w)
      val ids = new Array[Int](s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        var id = charId(c)
        if (id == 0) { id = intern(String.valueOf(c)); charId(c) = id }
        ids(i) = id
        i += 1
      }
      words(w) = ids; freqs(w) = f; totalPos += ids.length
      i = 0
      while (i < ids.length - 1) {
        val p = pack(ids(i), ids(i + 1))
        bump(p, f)
        val vec = pairWords.getOrElseUpdate(p, new IntVec)
        if (vec.isEmpty || vec.last != w) vec.add(w)
        i += 1
      }
      w += 1
    }
    flushDirty() // one settled heap entry per distinct initial pair

    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // pop to the first entry whose snapshot still matches its live count
      var winner = -1L
      var winCnt = 0L
      while (winner < 0 && heap.nonEmpty) {
        val (c, l, r) = heap.dequeue()
        val p = pack(l, r)
        if (pairCounts.get(p) == c) { winner = p; winCnt = c }
      }
      if (winner < 0 || winCnt < minPairCount) done = true
      else {
        val l = (winner >>> 32).toInt
        val r = winner.toInt
        merges += ((rank, idSyms(l), idSyms(r), winCnt))
        val nid = intern(idSyms(l) + idSyms(r))
        val affected = pairWords.getOrElse(winner, new IntVec)
        var ai = 0
        while (ai < affected.n) {
          val wi = affected.arr(ai)
          val old = words(wi)
          // verify (postings may be stale) and apply the merge
          // left-to-right non-overlapping, exactly like Bpe.applyMerge
          var has = false
          var i = 0
          while (!has && i < old.length - 1) {
            has = old(i) == l && old(i + 1) == r; i += 1
          }
          if (has) {
            val nw = new Array[Int](old.length)
            var o = 0
            i = 0
            while (i < old.length) {
              if (i + 1 < old.length && old(i) == l && old(i + 1) == r) {
                nw(o) = nid; o += 1; i += 2
              } else { nw(o) = old(i); o += 1; i += 1 }
            }
            val neu = java.util.Arrays.copyOf(nw, o)
            val f = freqs(wi)
            // pair-count delta of this word via two sorted primitive
            // pair arrays (multiset difference) — no boxed map in the
            // per-word loop
            val op = new Array[Long](math.max(old.length - 1, 0))
            i = 0
            while (i < old.length - 1) { op(i) = pack(old(i), old(i + 1)); i += 1 }
            val np = new Array[Long](math.max(neu.length - 1, 0))
            i = 0
            while (i < neu.length - 1) { np(i) = pack(neu(i), neu(i + 1)); i += 1 }
            java.util.Arrays.sort(op)
            java.util.Arrays.sort(np)
            var oi = 0
            var ni = 0
            while (oi < op.length || ni < np.length) {
              if (oi < op.length && ni < np.length && op(oi) == np(ni)) {
                oi += 1; ni += 1 // unchanged occurrence — no delta
              } else if (ni == np.length ||
                  (oi < op.length && op(oi) < np(ni))) {
                if (op(oi) != winner) bump(op(oi), -f)
                oi += 1
              } else {
                val p = np(ni)
                bump(p, f)
                val vec = pairWords.getOrElseUpdate(p, new IntVec)
                if (vec.isEmpty || vec.last != wi) vec.add(wi)
                ni += 1
              }
            }
            words(wi) = neu
          }
          ai += 1
        }
        pairCounts.put(winner, 0L)
        pairWords.remove(winner)
        flushDirty()
        rank += 1
      }
    }
    merges.toSeq
  }
}
