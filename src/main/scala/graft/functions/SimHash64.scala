package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** 64-bit SimHash of a word array as one Catalyst expression: hash each
  * word once (xxhash64 semantics, seed 42 — same as Spark's `xxhash64`),
  * accumulate per-bit ±1 counts, set bit b iff its count is positive.
  *
  * Replaces the composable nested-aggregate form, which re-hashed every
  * word for each of the 64 bits (64× the hashing) in interpreted
  * lambdas. Bit-identical output (parity-tested).
  */
final case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null) {
        val bytes = w.getBytes
        val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET,
          bytes.length, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def simhash64(words: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(words)))
}
