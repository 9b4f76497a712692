package graft

import graft.text.LangId
import org.apache.spark.sql.functions._

/** The expression form of the language-ID heuristic must agree with the
  * plain-Scala scorer row for row — on crafted edge cases and on the
  * real test corpus — and must not introduce a serde boundary.
  */
class LangIdSpec extends SparkFunSuite {

  private def predict(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("toks", LangId.tokens(col("text")))
      .select(col("doc_id"),
        LangId.detectFromTokens(col("text"), col("toks")).as("pred"))

  test("expression scorer matches LangId.detect on edge cases") {
    import spark.implicits._
    val cases = Seq(
      1L -> "the cat and the dog sat on the mat for a while",
      2L -> "der hund und die katze ist nicht mit im haus",
      3L -> "le chat est dans la maison avec le chien",
      4L -> "el perro es un animal que vive en la casa",
      5L -> "中文文本测试内容示例",
      6L -> "", // empty → und
      7L -> "   \t  ", // whitespace-only → und
      8L -> "xyzzy plugh qwerty asdf", // no hits → und
      9L -> "de la de la", // fr/es tie on shared words → first wins
      10L -> "  the   spaced    tokens the  ",
      // isWhitespace-but-not-regex-\s chars (ideographic space U+3000,
      // line/para separators U+2028/29): both forms must count them in
      // the CJK-ratio denominator identically (regex-\s semantics), or
      // they'd disagree near the 0.3 zh threshold
      11L -> "中文　文本　の and text here",
      12L -> "中　　　the and of to in")
    val df = cases.toDF("doc_id", "text")
    val got = predict(df).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, text) =>
      assert(got(id) == LangId.detect(text), s"doc $id: '$text'")
    }
  }

  test("expression scorer matches LangId.detect on the sf0.001 corpus, plan has no serde") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val exprPred = predict(docs)
    assert(!exprPred.queryExecution.executedPlan.toString
      .contains("DeserializeToObject"))
    val scalaPred = docs.as[(Long, String)]
      .map { case (id, t) => (id, LangId.detect(t)) }
      .toDF("doc_id", "pred")
    val mismatches = exprPred.as("a")
      .join(scalaPred.as("b"), Seq("doc_id"))
      .filter(col("a.pred") =!= col("b.pred"))
    assert(mismatches.count() == 0)
  }
}
