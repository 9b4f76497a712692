package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SparkSessionExtensions registration for graft's custom Catalyst
  * expressions, making them callable from SQL:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * // or spark.sql.extensions=graft.functions.GraftExtensions
  * spark.sql("SELECT shingle_minhash(split(text, ' '), 64, 3) FROM docs")
  * spark.sql("SELECT simhash60(split(text, ' ')) FROM docs")
  * }}}
  *
  * For sessions created without extensions, [[GraftExtensions.register]]
  * installs the same functions on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.shingleMinhashDesc)
    e.injectFunction(GraftExtensions.simhash60Desc)
    e.injectFunction(GraftExtensions.winnowDesc)
    e.injectFunction(GraftExtensions.vectorDotDesc)
    e.injectFunction(GraftExtensions.vectorCosineDesc)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private[functions] val shingleMinhashDesc
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_minhash"),
    new ExpressionInfo(classOf[ShingleMinHash].getName, "shingle_minhash"),
    { args: Seq[Expression] =>
      args match {
        case Seq(words) => ShingleMinHash(words, 64, 3)
        case Seq(words, k) => ShingleMinHash(words, intArg(k, "k"), 3)
        case Seq(words, k, n) =>
          ShingleMinHash(words, intArg(k, "k"), intArg(n, "n"))
        case _ => throw new IllegalArgumentException(
          "shingle_minhash(words[, numHashes[, shingleLen]])")
      }
    })

  private[functions] val simhash60Desc
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash60"),
    new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
    { args: Seq[Expression] =>
      args match {
        case Seq(words) => SimHash60(words)
        case _ => throw new IllegalArgumentException("simhash60(words)")
      }
    })

  private[functions] val winnowDesc
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("winnow_fingerprint"),
    new ExpressionInfo(classOf[Winnow].getName, "winnow_fingerprint"),
    { args: Seq[Expression] =>
      args match {
        case Seq(text) => Winnow(text, 8, 16)
        case Seq(text, k) => Winnow(text, intArg(k, "k"), 16)
        case Seq(text, k, w) =>
          Winnow(text, intArg(k, "k"), intArg(w, "w"))
        case _ => throw new IllegalArgumentException(
          "winnow_fingerprint(text[, k[, w]])")
      }
    })

  private[functions] val vectorDotDesc
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vector_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
    { args: Seq[Expression] =>
      args match {
        case Seq(a, b) => VectorDot(a, b)
        case _ => throw new IllegalArgumentException("vector_dot(a, b)")
      }
    })

  private[functions] val vectorCosineDesc
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vector_cosine"),
    new ExpressionInfo(classOf[VectorCosine].getName, "vector_cosine"),
    { args: Seq[Expression] =>
      args match {
        case Seq(a, b) => VectorCosine(a, b)
        case _ => throw new IllegalArgumentException("vector_cosine(a, b)")
      }
    })

  /** Register on an existing session (temp-function registry). */
  def register(spark: SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    reg.registerFunction(shingleMinhashDesc._1, shingleMinhashDesc._2,
      shingleMinhashDesc._3)
    reg.registerFunction(simhash60Desc._1, simhash60Desc._2,
      simhash60Desc._3)
    reg.registerFunction(winnowDesc._1, winnowDesc._2, winnowDesc._3)
    reg.registerFunction(vectorDotDesc._1, vectorDotDesc._2,
      vectorDotDesc._3)
    reg.registerFunction(vectorCosineDesc._1, vectorCosineDesc._2,
      vectorCosineDesc._3)
  }
}
