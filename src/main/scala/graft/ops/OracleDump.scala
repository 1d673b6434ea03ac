package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared artifact-dump scheme for oracle twins of trained/hash-kernel
  * queries (the `q_ivf_assign_trained` centroid-dump pattern, r5,
  * generalized in r8 to shrink the `no_oracle` set): when a query's
  * only oracle blocker is a value DuckDB cannot re-derive (a float
  * k-means fit, an xxhash64 signature), the query dumps THAT value to
  * a tiny sf-keyed parquet and the DuckDB SQL reads it as an input —
  * the model/signature becomes a given (exactly like the md5-dyadic
  * fixed codebooks), and the OPERATOR around it (assignment, banding,
  * bucket-pairing, caps, CC, verification, re-rank) is what the oracle
  * hash-checks. The un-dumpable kernel itself stays ScalaTest-verified.
  *
  * Only a run at the SF the oracle SQL hardcodes (sf0.01, the driver's
  * compare SF) ever writes — a bench/sweep run at another SF computes
  * normally but skips the dump, so it can neither clobber the compare
  * input nor pay the dump cost in a timed run. The write is PUBLISHED
  * ATOMICALLY: parquet lands in a unique temp dir, then one rename
  * swaps it in — a concurrent DuckDB read on a shared host sees the
  * old dump or the new one, never a half-written dir (mode-overwrite
  * deletes first, leaving an empty-path window).
  */
object OracleDump {

  val oracleSf = "sf0.01"
  val root = "/tmp/graft_oracle"

  /** Dump path for `name` as the DuckDB SQL must reference it. The SQL
    * string is static (the driver's contract), so it names the compare
    * SF; a sweep at another SF rewrites the `_sf0.01/` segment to its
    * own SF (`scripts/remap_dump_scoped.py`) after a Verify run made
    * that SF's dumps exist (the `SPARK_GRAFT_DUMP_ALL_SF` knob below). */
  def path(name: String): String = s"$root/${name}_$oracleSf/*.parquet"

  /** Sweep knob: with `SPARK_GRAFT_DUMP_ALL_SF=1`, dumps are written at
    * EVERY SF (each under its own sf-keyed dir — concurrent sweeps at
    * different SFs never collide), so the 3-SF sweep can oracle-check
    * the dump-scoped keys instead of stripping them. Unset (the driver
    * and every bench run), only the compare SF writes — a timed run at
    * another SF pays zero dump cost and can't clobber the compare input. */
  private def dumpAllSf: Boolean =
    sys.env.get("SPARK_GRAFT_DUMP_ALL_SF").contains("1")

  /** Atomically publish `df` (small by contract — coalesced to one
    * file) under `name` iff `sfDir` is the oracle SF (or the all-SF
    * sweep knob is set, in which case the dump is keyed by the ACTUAL
    * SF name). */
  def write(df: DataFrame, sfDir: String, name: String): Unit = {
    val sfName = new java.io.File(sfDir).getName
    if (sfName == oracleSf || dumpAllSf) {
      val target = new java.io.File(s"$root/${name}_$sfName")
      val tmp = new java.io.File(
        target.getParent, s".tmp_${target.getName}_${java.util.UUID.randomUUID()}")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      org.apache.commons.io.FileUtils.deleteQuietly(target)
      if (!tmp.renameTo(target)) {
        // same-filesystem rename only fails if a concurrent run
        // re-created the target in the gap; its dump is equally valid
        // (deterministic derivation) — drop ours
        org.apache.commons.io.FileUtils.deleteQuietly(tmp)
      }
      ()
    }
  }
}
