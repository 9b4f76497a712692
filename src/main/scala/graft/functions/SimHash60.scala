package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 60-bit SimHash of a word array as one Catalyst expression: hash
  * each word once with the portable [[PortableHash.h60]] (60 random
  * bits an oracle recomputes exactly), accumulate per-bit ±1 counts,
  * set bit b iff its count is positive.
  *
  * 60 bits (not 64) because h60 is the widest integer both engines
  * parse from an MD5 prefix without overflowing a signed 64-bit value;
  * the LSH banding splits the signature into 4×15-bit quarters, so the
  * Hamming-distance pigeonhole argument (distance ≤ 3 ⇒ one exact
  * quarter) is unchanged.
  *
  * Replaces the composable nested-aggregate form, which re-hashes
  * every word for each of the 60 bits in interpreted lambdas.
  * Bit-identical output (parity-tested in FunctionsSpec).
  */
final case class SimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null) {
        val h = PortableHash.h60(w.getBytes)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  def simhash60(words: Column): Column =
    GraftColumnBridge.column(SimHash60(GraftColumnBridge.expression(words)))
}
