package graft

import graft.sources.Profile
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkFunSuite {

  test("single-pass profile captures nulls, ranges, cardinalities") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(1.5)),
      (2L, None, Some(2.5)),
      (3L, Some("c"), None),
      (4L, Some("a"), Some(9.0)))
      .toDF("id", "s", "v")
    val p = Profile.profile(df).map(c => c.column -> c).toMap
    assert(p("id").nRows == 4 && p("id").nNulls == 0)
    assert(p("id").min == "1" && p("id").max == "4")
    assert(p("s").nNulls == 1)
    assert(p("s").min == "a" && p("s").max == "c")
    assert(p("v").nNulls == 1 && p("v").max == "9.0")
    assert(p("s").approxDistinct == 2) // exact at tiny cardinality
  }

  test("profile of lineitem runs as ONE job and is sane") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val p = Profile.profile(li).map(c => c.column -> c).toMap
    assert(p("l_orderkey").nNulls == 0)
    assert(p("l_quantity").min.toDouble >= 1.0)
    assert(p("l_returnflag").approxDistinct <= 4)
    assert(p.values.map(_.nRows).toSet.size == 1) // one consistent count
  }

  test("compare flags drift between source and tampered target") {
    import spark.implicits._
    val src = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "s")
    val sameProfile = Profile.profile(src)
    assert(Profile.compare(sameProfile, Profile.profile(src)).isEmpty)
    val tampered = src.withColumn("s",
      when(col("id") === 2, lit(null)).otherwise(col("s")))
    val issues = Profile.compare(sameProfile, Profile.profile(tampered))
    assert(issues.exists(_.contains("nulls")), issues.toString)
    val missingCol = src.drop("s")
    val issues2 = Profile.compare(sameProfile, Profile.profile(missingCol))
    assert(issues2.exists(_.contains("missing in target")))
  }
}
