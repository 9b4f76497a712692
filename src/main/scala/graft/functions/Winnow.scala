package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (the fingerprinting scheme from the
  * document-fingerprinting literature, e.g. MOSS): hash every k-char
  * gram, then keep the minimum hash of each sliding window of w grams,
  * distinct and sorted. Any match of length ≥ w+k-1 between two
  * documents is guaranteed to share a fingerprint — substring-level
  * near-dup detection, robust to edits outside the match, cheap to
  * join on (explode + equi-join on the fingerprint value at scale).
  *
  * Gram hashes are [[PortableHash.h60]] of the gram text (not a
  * wrapping-arithmetic rolling hash — 64-bit wraparound isn't
  * portable to engines whose integer ops error on overflow), so a
  * DuckDB oracle re-derives the exact fingerprint set:
  * `list_min` over `('0x'||substr(md5(gram),1,15))::BIGINT` windows.
  * The winnowing guarantee only needs equal grams ⇒ equal hashes;
  * rolling-ness was a constant-factor optimization, and at ~16 bytes
  * per gram one MD5 per position is still linear in document size.
  *
  * Window minima take the smallest VALUE per window (ties in position
  * are irrelevant because only the value set is emitted, and value
  * ties are ~impossible at 60 bits).
  */
final case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val hashes = Winnow.gramHashArray(text, k)
    val nGrams = hashes.length
    if (nGrams == 0) return ArrayData.toArrayData(Array.empty[Long])
    var i = 0
    if (nGrams <= w) {
      var min = hashes(0)
      i = 1
      while (i < nGrams) { if (hashes(i) < min) min = hashes(i); i += 1 }
      return ArrayData.toArrayData(Array(min))
    }
    // winnow: min of each window of w gram hashes
    val selected = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i + w <= nGrams) {
      var min = hashes(i)
      var j = i + 1
      while (j < i + w) {
        if (hashes(j) < min) min = hashes(j)
        j += 1
      }
      selected.add(min)
      i += 1
    }
    val out = new Array[Long](selected.size())
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {
  /** Column API: winnowing fingerprint set of `text` (k-gram length k,
    * window w).
    */
  def winnowFingerprint(text: Column, k: Int = 8, w: Int = 16): Column =
    GraftColumnBridge.column(Winnow(GraftColumnBridge.expression(text), k, w))

  /** Column API: all k-gram h60 hashes of `text`, in position order
    * (with multiplicity — [[GramHashes]]).
    */
  def gramHashes(text: Column, k: Int): Column =
    GraftColumnBridge.column(GramHashes(GraftColumnBridge.expression(text), k))

  /** h60 of every k-gram of `text` in position order, WITH multiplicity,
    * where grams are k CODE POINTS — not UTF-16 code units. Spark's
    * `substring`/`length`, DuckDB's `substr`/`length`, and therefore
    * both the composable h60col+substring tower and the oracles count
    * code points; indexing by code unit would split surrogate pairs on
    * any non-BMP character (emoji, rare CJK) and silently break the
    * bit-parity contract. For BMP-only text the offset table is the
    * identity and the hashes are byte-identical to the old code-unit
    * loop (parity incl. an astral-plane case: FunctionsSpec).
    */
  private[functions] def gramHashArray(text: String, k: Int): Array[Long] = {
    val nChars = text.length
    val offs = new Array[Int](nChars + 1)
    var cp = 0
    var ci = 0
    while (ci < nChars) {
      offs(cp) = ci
      ci += Character.charCount(text.codePointAt(ci))
      cp += 1
    }
    offs(cp) = nChars
    if (cp < k) return Array.empty[Long]
    val out = new Array[Long](cp - k + 1)
    var i = 0
    while (i < out.length) {
      out(i) = PortableHash.h60(text.substring(offs(i), offs(i + k)))
      i += 1
    }
    out
  }
}

/** All k-char-gram h60 hashes of a string, in position order and WITH
  * multiplicity — the building block [[Winnow]] computes internally,
  * exposed for consumers that need every gram (d13's duplicated-span
  * coverage counts positions, so it can't use the winnowed subset).
  *
  * Exists for the same reason ShingleMinHash does: the composable
  * `transform(sequence(...), i -> conv(substr(md5(substr(text,...)))))`
  * form evaluates an interpreted lambda frame plus an md5 → hex-string
  * → conv parse chain PER GRAM; this expression runs one tight loop
  * per row with a thread-local digest and direct byte→long extraction.
  * Values are bit-identical to the composable form (FunctionsSpec) and
  * to the oracle's `('0x' || substr(md5(substr(t, i, k)), 1, 15))`.
  */
final case class GramHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, "gram length must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "gram_hashes"

  override def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(
      Winnow.gramHashArray(input.asInstanceOf[UTF8String].toString, k))

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}
