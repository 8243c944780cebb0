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
    val salted = probe.withColumn("__salt", probeSalt(probe, nSalt))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalt - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  // salt by CONTENT HASH of the whole row, never by position:
  // monotonically_increasing_id/spark_partition_id are
  // non-deterministic across partial map-stage recomputation, so a
  // fetch-failure retry could re-salt rows into different buckets
  // than the original run and silently drop/duplicate join output
  // (the SPARK-23207 failure class). A whole-row hash is stable under
  // any recomputation. Rows identical in EVERY column do share a salt,
  // but such rows are literal duplicates — if a corpus is dominated by
  // them, dedup-count first; that is a data bug, not a skew shape.
  private def probeSalt(probe: DataFrame, nSalt: Int) =
    pmod(xxhash64(probe.columns.map(col): _*), lit(nSalt)).cast("int")

  /** Hot-key-aware variant: only keys in `hotKeys` (a small relation —
    * typically the output of a heavy-hitter sketch over the probe) are
    * salted; every other key joins unsalted, with exactly ONE build
    * copy. This is the 100 TB shape: blanket replication multiplies the
    * whole build side by nSalt to fix a handful of keys, while measured
    * hot keys are usually a few hundred rows to replicate. False
    * positives in the sketch only cost a little extra replication —
    * the result is exactly the plain inner join either way.
    */
  def saltedJoinHot(probe: DataFrame, build: DataFrame, key: String,
                    nSalt: Int, hotKeys: DataFrame): DataFrame = {
    require(nSalt >= 1, "nSalt must be >= 1")
    val p = probeWithHotSalt(probe, key, nSalt, hotKeys)
    val b = replicateHotBuild(build, key, nSalt, hotKeys)
    p.join(b, Seq(key, "__salt")).drop("__salt")
  }

  /** Probe side of [[saltedJoinHot]]: hot rows get a content-hash salt
    * in [0, nSalt), cold rows salt 0. The hot set rides a broadcast
    * left join (it is sketch-sized by construction).
    */
  private[graft] def probeWithHotSalt(probe: DataFrame, key: String,
      nSalt: Int, hotKeys: DataFrame): DataFrame =
    probe.join(hotMarker(hotKeys, key), Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot"), probeSalt(probe, nSalt)).otherwise(lit(0)))
      .drop("__hot")

  /** Build side of [[saltedJoinHot]]: hot keys replicated nSalt times,
    * cold keys kept single — exactly build.count + (nSalt-1)*hotBuild
    * rows, vs nSalt*build.count under blanket replication.
    */
  private[graft] def replicateHotBuild(build: DataFrame, key: String,
      nSalt: Int, hotKeys: DataFrame): DataFrame =
    build.join(hotMarker(hotKeys, key), Seq(key), "left")
      .withColumn("__salt", explode(
        when(col("__hot"), sequence(lit(0), lit(nSalt - 1)))
          .otherwise(sequence(lit(0), lit(0)))))
      .drop("__hot")

  private def hotMarker(hotKeys: DataFrame, key: String): DataFrame =
    broadcast(hotKeys.select(col(key)).distinct()
      .withColumn("__hot", lit(true)))
}
