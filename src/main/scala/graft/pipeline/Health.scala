package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Pre-flight health probes — the library twin of the reference's
  * Airflow database hook (airflow/hooks/database.py:34-101): fail FAST
  * before a pipeline run rather than mid-run, and fail by RAISING so
  * the caller's retry machinery ([[Retry]], the Airflow-retry analog)
  * owns the policy — the same "exception intentionally not caught"
  * contract the reference documents.
  *
  * `checkEngineHealth` is the SELECT 1 twin (database.py:34-63): one
  * trivial statement through the full SQL path — parser, planner, and
  * an executed job — proving the session is live and can schedule
  * work. `checkTableExists` is the information_schema probe
  * (database.py:66-101) against the catalog; `checkPathTableExists`
  * is the same probe for this repo's path-based tables (the Bronze
  * parquet dir the streaming sink appends to, and any [[TxTable]]
  * root), where "exists" must mean READABLE — a dir with no committed
  * footer fails the probe, not the mid-pipeline scan.
  */
object Health {

  /** SELECT 1 through the real SQL path. True on success; throws on a
    * dead/unschedulable session or an unexpected result (the
    * reference's exact raise condition, database.py:56-58). */
  def checkEngineHealth(spark: SparkSession): Boolean = {
    val r = spark.sql("SELECT 1").collect()
    if (r.length != 1 || r(0).getInt(0) != 1)
      throw new IllegalStateException(
        s"engine health check: unexpected result ${r.mkString(",")}")
    true
  }

  /** Catalog-table existence (database.py:66-101 twin). Throws when
    * missing — schema-not-initialized is a pre-flight failure. */
  def checkTableExists(spark: SparkSession, name: String): Boolean = {
    if (!spark.catalog.tableExists(name))
      throw new IllegalStateException(s"table $name does not exist")
    true
  }

  /** Path-based existence for the repo's file tables: the path must
    * hold a readable table — a parquet dir with a loadable schema, or
    * a [[TxTable]] root with a committed version. Throws otherwise. */
  def checkPathTableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw new IllegalStateException(s"table path $path does not exist")
    val readable =
      if (fs.exists(new org.apache.hadoop.fs.Path(path, "_txlog")))
        TxTable.latest(spark, path)._1 > 0
      else
        scala.util.Try(spark.read.parquet(path).schema.nonEmpty).getOrElse(false)
    if (!readable)
      throw new IllegalStateException(
        s"table path $path exists but holds no readable committed data")
    true
  }
}
