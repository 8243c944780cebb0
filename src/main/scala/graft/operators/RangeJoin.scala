package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic scalable range join (SURVEY §2.4/§7.4; approach of VLDB'22
  * "A Scalable and Generic Approach to Range Joins"): point-in-interval
  * joins with NO equi key, executed as an equi-join on a derived time
  * bucket instead of a cartesian product.
  *
  * Each interval row is exploded to every bucket it overlaps; each probe
  * row lands in exactly ONE bucket, so after the bucket equi-join +
  * exact range filter every qualifying (probe, interval) pair appears
  * exactly once — no dedup pass. Shuffles move (rows × avg buckets per
  * interval), not |probe| × |intervals|; `bucketWidth` trades explode
  * fan-out against per-bucket join density (pick ≈ the median interval
  * length). Bucket skew (a hot time range) is AQE skew-join territory.
  */
object RangeJoin {

  /** Join `probe` rows whose `probeTime` falls in [startCol, endCol) of
    * `intervals`. Times are NON-NEGATIVE monotone integers — callers
    * convert timestamps up front (`Tables.epochNs` for the testdata);
    * `div` truncates, which equals floor for non-negatives and keeps the
    * arithmetic in exact 64-bit integers — a double division would
    * corrupt nano-precision timestamps above 2^53.
    * Column-name collisions are the caller's to avoid (as with any join).
    */
  def pointInInterval(probe: DataFrame, probeTime: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = call_function("div", c, lit(bucketWidth))
    val pb = probe.withColumn("__bkt", bucketOf(col(probeTime)))
    // end is exclusive: the last overlapped bucket is the one of end-1.
    // Empty/inverted intervals are dropped FIRST: they can never match,
    // and sequence(a, b) with a > b generates a DESCENDING sequence — one
    // corrupt row (end before start) would otherwise explode to billions
    // of buckets and kill the job.
    val iv = intervals.filter(col(endCol) > col(startCol))
      .withColumn("__bkt",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol) - 1))))
    pb.join(iv, Seq("__bkt"))
      .filter(col(probeTime) >= col(startCol) && col(probeTime) < col(endCol))
      .drop("__bkt")
  }
}
