package graft

import graft.model.DangerousWrite
import graft.plans.DangerousWriteGate
import java.nio.file.Files
import org.apache.spark.sql.SaveMode

/** The plan-level danger gate: Overwrite writes under a protected root
  * are rejected at optimization time (no task ever launches), append
  * writes and unprotected paths pass, and spark.graft.force bypasses —
  * the Spark-plan analogue of the reference's apply danger gate.
  */
class PlanGateSpec extends SparkFunSuite {

  def withGate(body: String => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-protected").toString
    DangerousWriteGate.install(spark)
    spark.conf.set(DangerousWriteGate.ProtectedPathsKey, dir)
    try body(dir)
    finally {
      DangerousWriteGate.uninstall(spark)
      spark.conf.unset(DangerousWriteGate.ProtectedPathsKey)
      spark.conf.unset(DangerousWriteGate.ForceKey)
    }
  }

  def sampleDf = {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
  }

  test("overwrite under a protected root is blocked at plan time") {
    withGate { dir =>
      val e = intercept[DangerousWrite] {
        sampleDf.write.mode(SaveMode.Overwrite).parquet(s"$dir/tracker")
      }
      assert(e.protectedRoot == dir)
      // nothing was written
      assert(!Files.exists(java.nio.file.Paths.get(s"$dir/tracker")))
    }
  }

  test("append mode and unprotected paths pass the gate") {
    withGate { dir =>
      sampleDf.write.mode(SaveMode.Append).parquet(s"$dir/tracker")
      assert(spark.read.parquet(s"$dir/tracker").count() == 2)
      val other = Files.createTempDirectory("graft-unprotected").toString
      sampleDf.write.mode(SaveMode.Overwrite).parquet(s"$other/out")
      assert(spark.read.parquet(s"$other/out").count() == 2)
    }
  }

  test("spark.graft.force=true bypasses the gate (the --force flag)") {
    withGate { dir =>
      spark.conf.set(DangerousWriteGate.ForceKey, "true")
      sampleDf.write.mode(SaveMode.Overwrite).parquet(s"$dir/tracker")
      assert(spark.read.parquet(s"$dir/tracker").count() == 2)
    }
  }

  test("gate uninstall restores normal overwrite behavior") {
    val dir = Files.createTempDirectory("graft-protected2").toString
    DangerousWriteGate.install(spark)
    spark.conf.set(DangerousWriteGate.ProtectedPathsKey, dir)
    DangerousWriteGate.uninstall(spark)
    try {
      sampleDf.write.mode(SaveMode.Overwrite).parquet(s"$dir/t")
      assert(spark.read.parquet(s"$dir/t").count() == 2)
    } finally spark.conf.unset(DangerousWriteGate.ProtectedPathsKey)
  }
}
