package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key (skew) handling for shuffle joins.
  *
  * Spark's AQE splits skewed SORT-MERGE join partitions at runtime, and
  * map-side partial aggregation absorbs most aggregation skew — so most
  * skew needs no code. The remaining case is a shuffle join whose hot
  * keys AQE can't split (pre-AQE plans, bucketed/co-partitioned inputs
  * AQE won't re-shuffle, or a build side small enough to replicate but
  * too big to broadcast): classic key salting.
  */
object Skew {

  /** Inner equi-join with the probe side's hot keys spread across
    * `nSalt` shuffle partitions. Probe rows get a deterministic salt
    * (hash of the whole row — no RNG, so retries/speculative tasks see
    * the same salt); build rows are replicated once per salt value. The
    * join key becomes (key, salt): a key with billions of probe rows
    * lands in nSalt partitions instead of one, at the cost of a
    * nSalt-times-larger build side — the standard trade when the build
    * side is orders of magnitude smaller than the probe's hot keys.
    *
    * Result is exactly the plain inner join (every probe row matches
    * its build rows in precisely one salt bucket) — declared as x20
    * with the unsalted SQL as its oracle.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 nSalt: Int): DataFrame = {
    require(nSalt >= 1, "nSalt must be >= 1")
    // salt by CONTENT HASH of the whole row, never by position:
    // monotonically_increasing_id/spark_partition_id are
    // non-deterministic across partial map-stage recomputation, so a
    // fetch-failure retry could re-salt rows into different buckets
    // than the original run and silently drop/duplicate join output
    // (the SPARK-23207 failure class). A whole-row hash is stable under
    // any recomputation. Rows identical in EVERY column do share a salt,
    // but such rows are literal duplicates — if a corpus is dominated by
    // them, dedup-count first; that is a data bug, not a skew shape.
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(nSalt)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalt - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
