package graft.text

import scala.collection.mutable

/** Single-task BPE training kernel — the round-16 optimization of the
  * 50-round distributed `bpeTrain` loop (TextCurationOps).
  *
  * Why: the distributed loop paid ~2 Spark jobs per merge round (the
  * pair-census collect and a `localCheckpoint`), and at 50 merges the
  * ~100 vocabulary-scale jobs were pure scheduling overhead — the
  * census is word-vocabulary-sized (Heaps' law), not corpus-sized, so
  * it fits one task at any corpus scale the same way every production
  * BPE trainer (SentencePiece, HF tokenizers) trains on a single node
  * over a word census. The corpus-scale work (tokenize + word count)
  * stays distributed; only the merge loop runs here. The production
  * knob when a raw census outgrows one task is the standard min-count
  * prune — BPE merges are count-ranked, so words below any min
  * frequency cannot change the top pair until merges make them
  * aggregate, which a census-scale trainer caps deliberately.
  *
  * Bit-compatibility contract (asserted against the old dataflow in
  * QueriesSpec): every step replicates the Spark expression semantics
  * of the round-15 loop exactly —
  *   - initial seq: `rtrim(regexp_replace(word, "(.)", "$1 "))` — Java
  *     regex via `replaceAll` (DOT skips line terminators, same engine
  *     Spark's regexp_replace uses), then trailing 0x20s stripped
  *     (Spark `rtrim` strips spaces only);
  *   - pair census: `split(seq, " ")` with Java limit -1 semantics,
  *     adjacent pairs WITH multiplicity, counts summed as longs;
  *   - merge choice: max by (count desc, lhs asc, rhs asc) where the
  *     string order is unsigned UTF-8 byte order (UTF8String.compare);
  *   - rewrite: literal non-overlapping left-to-right replace of
  *     "l r" with "lr" (java.lang.String.replace ≡ UTF8String.replace
  *     — UTF-8 is self-synchronizing, so byte-level and char-level
  *     literal search agree), including its cross-token artifacts
  *     (e.g. "ab c" matches pair (b, c) at the string level);
  *   - early stop when no adjacent pair remains.
  */
object BpeTrainer extends Serializable {

  /** One output row of [[train]]: kind 0 = a (word, cnt, seq) final
    * sequence; kind 1 = a merge-table entry (rank, lhs=word, rhs=seq).
    */
  final case class BpeRow(kind: Int, rank: Int, word: String, cnt: Long,
      seq: String)

  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** rtrim(regexp_replace(word, "(.)", "$1 ")) — exact twin. */
  private[text] def initSeq(word: String): String = {
    val spaced = word.replaceAll("(.)", "$1 ")
    var end = spaced.length
    while (end > 0 && spaced.charAt(end - 1) == ' ') end -= 1
    spaced.substring(0, end)
  }

  /** Run `nMerges` BPE rounds over a (word, cnt) census partition.
    * Must be called on the single partition holding the whole census.
    */
  def train(it: Iterator[(String, Long)], nMerges: Int)
      : Iterator[BpeRow] = {
    val words = it.toArray
    val seqs = new Array[String](words.length)
    var i = 0
    while (i < words.length) { seqs(i) = initSeq(words(i)._1); i += 1 }
    val merges = mutable.ArrayBuffer[(Int, String, String)]()
    var exhausted = false
    var rank = 1
    while (rank <= nMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]()
      i = 0
      while (i < words.length) {
        val toks = seqs(i).split(" ", -1)
        val cnt = words(i)._2
        var j = 0
        while (j + 1 < toks.length) {
          val key = (toks(j), toks(j + 1))
          val prev = counts.get(key)
          counts.put(key, (if (prev == null) 0L else prev.longValue) + cnt)
          j += 1
        }
        i += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        var bestL: String = null
        var bestR: String = null
        var bestC = Long.MinValue
        val eit = counts.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          val (l, r) = e.getKey
          val c = e.getValue.longValue
          val better = c > bestC || (c == bestC && {
            val dl = utf8Cmp(l, bestL)
            dl < 0 || (dl == 0 && utf8Cmp(r, bestR) < 0)
          })
          if (better) { bestL = l; bestR = r; bestC = c }
        }
        merges += ((rank, bestL, bestR))
        val search = bestL + " " + bestR
        val repl = bestL + bestR
        i = 0
        while (i < words.length) {
          seqs(i) = seqs(i).replace(search, repl)
          i += 1
        }
        rank += 1
      }
    }
    val seqRows = words.iterator.zipWithIndex.map { case ((w, c), idx) =>
      BpeRow(0, 0, w, c, seqs(idx))
    }
    val mergeRows = merges.iterator.map { case (r, l, rr) =>
      BpeRow(1, r, l, 0L, rr)
    }
    seqRows ++ mergeRows
  }
}
