package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (the rolling-hash fingerprinting
  * scheme from the document-fingerprinting literature, e.g. MOSS):
  * Karp–Rabin rolling hashes over all k-char grams, then the minimum
  * hash of each sliding window of w grams (rightmost on ties), distinct
  * and sorted. Any match of length ≥ w+k-1 between two documents is
  * guaranteed to share a fingerprint — substring-level near-dup
  * detection, robust to edits outside the match, cheap to join on
  * (explode + equi-join on the fingerprint value at scale).
  *
  * One O(n) eval pass per row: the rolling hash reuses the previous
  * gram's value (subtract-shift-add), the window minimum uses a simple
  * rescan-on-evict (window sizes are small constants).
  */
final case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fingerprint"

  private val Base = 1000003L

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val n = text.length
    if (n < k) return ArrayData.toArrayData(Array.empty[Long])
    // rolling Karp–Rabin over k-grams
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + text.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < nGrams) {
      h = (h - text.charAt(i - 1) * pow) * Base + text.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    if (nGrams <= w) {
      var min = hashes(0)
      i = 1
      while (i < nGrams) { if (hashes(i) <= min) min = hashes(i); i += 1 }
      return ArrayData.toArrayData(Array(min))
    }
    // winnow: min of each window of w gram hashes, rightmost on ties
    val selected = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i + w <= nGrams) {
      var min = hashes(i)
      var j = i + 1
      while (j < i + w) {
        if (hashes(j) <= min) min = hashes(j)
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
}
