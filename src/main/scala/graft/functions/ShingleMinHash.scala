package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** MinHash signature over n-word shingles as a single Catalyst
  * expression, built entirely from the portable [[PortableHash]]
  * arithmetic so a DuckDB oracle re-derives signatures bit-for-bit:
  *
  *   hp      = h60(shingle) mod P            (P = 2^31-1)
  *   sig_i   = min over shingles of (permA(i)*hp + permB(i)) mod P
  *
  * Semantically identical to the composable form
  * `transform(sequence(0,k-1), i -> array_min(transform(shingles3(w),
  * s -> (A[i]*(h60(s)%P)+B[i])%P)))` (parity-tested in FunctionsSpec),
  * but the composable form evaluates nested interpreted lambdas
  * (higher-order functions don't participate in whole-stage codegen):
  * k×n lambda frames plus an `element_at`+`concat_ws` tree per shingle.
  * This expression makes one pass per row: build each shingle's bytes
  * once, one MD5, then k multiply-mods updating the running mins.
  *
  * Duplicate shingles need no dedup — the min is unaffected by
  * multiplicity. Rows with no shingles (fewer than `shingleLen` words)
  * return the Long.MaxValue sentinel signature, which joins safely
  * (callers prune them before banding — see d03).
  */
final case class ShingleMinHash(child: Expression, numHashes: Int,
    shingleLen: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_minhash"

  // permutation coefficients are instance constants derived from the
  // documented tags — the oracle recomputes them with the same formula
  @transient private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(PortableHash.permA)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(PortableHash.permB)

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + shingleLen <= n) {
      sb.setLength(0)
      var j = 0
      while (j < shingleLen) {
        if (j > 0) sb.append(' ')
        val w = words.getUTF8String(i + j)
        if (w != null) sb.append(w.toString)
        j += 1
      }
      val hp = PortableHash.h60(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)) %
        PortableHash.P
      var h = 0
      while (h < numHashes) {
        val v = (as(h) * hp + bs(h)) % PortableHash.P
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      i += 1
    }
    ArrayData.toArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}

object ShingleMinHash {
  /** Column API: minhash signature of the n-word shingles of `words`. */
  def shingleMinhash(words: Column, k: Int = 64, n: Int = 3): Column =
    GraftColumnBridge.column(
      ShingleMinHash(GraftColumnBridge.expression(words), k, n))
}
