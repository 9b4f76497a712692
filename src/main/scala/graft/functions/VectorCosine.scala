package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity of two numeric arrays as ONE fused codegen'd
  * loop: `dot(a,b) / sqrt(dot(a,a)) / sqrt(dot(b,b))` with all three
  * accumulators advanced per element in a single array traversal.
  *
  * BIT-IDENTICAL to the composable form
  * `VectorDot.dot(a,b) / sqrt(VectorDot.dot(a,a)) /
  * sqrt(VectorDot.dot(b,b))` (parity-tested in FunctionsSpec): each
  * accumulator sees the same per-element float→double cast, multiply,
  * and left-to-right accumulation order; the two divisions and
  * `Math.sqrt` calls are the same IEEE ops in the same order — so
  * swapping it into an oracle-checked query never moves a hash. Null
  * semantics match too: length mismatch or any null element yields
  * NULL. ONE pinned divergence (FunctionsSpec): a ZERO-NORM vector
  * makes the ANSI-mode composable form throw (double divide-by-zero
  * is an ANSI error), while this expression follows IEEE and yields
  * NaN — the behavior DuckDB's oracle arithmetic has too; no catalog
  * query feeds a zero vector.
  *
  * Why it exists: [[VectorDot]] removed the lambda-tower overhead, but
  * `cosine()` composed THREE of them — three traversals of the same
  * arrays per candidate pair, and the query-side norm
  * (`sqrt(dot(q,q))`, a constant under a broadcast query) re-walked
  * the query vector once per corpus row. One fused loop reads each
  * element exactly once. Sits in the per-pair hot path of
  * s01/s13/d05/d10/d17 and every recall harness.
  */
final case class VectorCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_cosine"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    val af = isFloat(left)
    val bf = isFloat(right)
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    ab / Math.sqrt(aa) / Math.sqrt(bb)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      def get(arr: String, e: Expression): String =
        if (isFloat(e)) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    final double $x = ${get(a, left)};
         |    final double $y = ${get(b, right)};
         |    $ab += $x * $y; $aa += $x * $x; $bb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $ab / Math.sqrt($aa) / Math.sqrt($bb);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VectorCosine =
    copy(left = newLeft, right = newRight)
}

object VectorCosine {
  /** Column API: `dot(a,b) / sqrt(dot(a,a)) / sqrt(dot(b,b))`. */
  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(VectorCosine(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
