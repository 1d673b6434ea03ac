package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Health]] — the pre-flight probe twins of
  * airflow/hooks/database.py:34-101: succeed quietly, fail by raising
  * (the caller's retry machinery owns the policy). */
class HealthSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("engine health: SELECT 1 runs a real job and returns true") {
    assert(Health.checkEngineHealth(spark))
  }

  test("catalog table existence: present passes, missing raises") {
    Seq((1, "a")).toDF("id", "v").createOrReplaceTempView("health_probe_t")
    assert(Health.checkTableExists(spark, "health_probe_t"))
    val e = intercept[IllegalStateException] {
      Health.checkTableExists(spark, "health_probe_missing")
    }
    assert(e.getMessage.contains("does not exist"))
  }

  test("path table existence: parquet dir passes, missing dir and dataless dir raise") {
    val root = graft.TestTmp.dir("health")
    val good = s"$root/good"
    Seq((1L, "x")).toDF("id", "v").write.parquet(good)
    assert(Health.checkPathTableExists(spark, good))

    intercept[IllegalStateException] {
      Health.checkPathTableExists(spark, s"$root/missing")
    }
    // exists-but-unreadable: an empty dir is a pre-flight failure, not
    // a mid-pipeline scan error
    val empty = s"$root/empty"
    new java.io.File(empty).mkdirs()
    val e = intercept[IllegalStateException] {
      Health.checkPathTableExists(spark, empty)
    }
    assert(e.getMessage.contains("no readable committed data"))
  }

  test("TxTable root: committed version passes, log-less/empty root raises") {
    val root = graft.TestTmp.dir("health-tx")
    val t = s"$root/t"
    TxTable.appendCommit(spark, t, Seq((1L, "a")).toDF("id", "p"), "p")
    assert(Health.checkPathTableExists(spark, t))
    // a root with a _txlog dir but no committed manifest is unreadable
    val bare = s"$root/bare"
    new java.io.File(s"$bare/_txlog").mkdirs()
    val e = intercept[IllegalStateException] {
      Health.checkPathTableExists(spark, bare)
    }
    assert(e.getMessage.contains("no readable committed data"))
  }
}
