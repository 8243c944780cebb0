package graft

class CheckpointBlocksSpec extends SparkSpecBase {
  import spark.implicits._

  test("release drops a localCheckpoint's persisted RDD; Dataset.unpersist does not") {
    def persistedIds: Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet

    val before = persistedIds
    val df = (1 to 1000).toDF("n").localCheckpoint(true)
    assert(df.count() === 1000)
    val added = persistedIds -- before
    assert(added.nonEmpty, "localCheckpoint must register a persisted RDD")

    // the trap this helper exists for: Dataset.unpersist goes through the
    // CacheManager, which never heard of the checkpoint RDD — blocks stay
    df.unpersist(blocking = true)
    assert((persistedIds -- before) === added,
      "Dataset.unpersist must NOT be able to drop checkpoint blocks (or this helper is obsolete)")

    CheckpointBlocks.release(df)
    assert((persistedIds -- before).isEmpty,
      "release must unpersist the checkpoint-backing RDD")
    // NOTE the contract: a local checkpoint's lineage is truncated, so
    // after release the frame is gone for good (recompute would throw
    // "checkpoint block not found") — release() is strictly for frames
    // that are DEAD: dropped memo entries, putIfAbsent losers,
    // superseded per-round iteration state.
  }

  test("release is a no-op on frames that are not checkpoint-backed") {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val df = (1 to 10).toDF("n").filter($"n" > 2)
    CheckpointBlocks.release(df) // must not throw
    assert(spark.sparkContext.getPersistentRDDs.keySet.toSet === before)
    assert(df.count() === 8)
  }

  test("release REFUSES a derived frame: the upstream checkpoint must survive") {
    val ckpt = (1 to 100).toDF("n").localCheckpoint(true)
    val derived = ckpt.select($"n" * 2 as "m").filter($"m" > 10)
    // releasing the dead projection must NOT destroy the live checkpoint
    CheckpointBlocks.release(derived)
    assert(ckpt.count() === 100, "upstream checkpoint poisoned by derived release")
    CheckpointBlocks.release(ckpt)
  }
}
