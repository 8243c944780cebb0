package graft

import org.apache.spark.sql.functions._

/** The x110 → x110n escalation contract: the content-hash group split
  * (x110) provably LEAKS near-duplicate pairs across train/eval, and
  * the cluster-id group split (x110n) provably cannot — the same
  * contrast the x100/x110 pair established for exact duplicates, one
  * level up (near-dup pairs instead of byte-equal ones).
  */
class NearDupSplitSpec extends SparkSpecBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  /** The verified near-dup pair relation (x02) labeled with a split
    * assignment on each side.
    */
  private def labeledPairs(splitQuery: String) = {
    val lab = q(splitQuery)
    q("x02_dedup_ngram_jaccard").select(col("a"), col("b"), col("jaccard"))
      .join(lab.select(col("id").as("a"), col("split").as("split_a")), Seq("a"))
      .join(lab.select(col("id").as("b"), col("split").as("split_b")), Seq("b"))
  }

  test("the near-dup pair relation is non-empty (the gates below are meaningful)") {
    assert(q("x02_dedup_ngram_jaccard").count() > 0)
  }

  test("x110's content split leaks NEAR-dup pairs across train/eval") {
    // exact copies share the content hash and can never straddle (the
    // x110g contract) — but a 0.5 <= j < 1 pair hashes to two
    // independent keys, and on this corpus some straddle. This is the
    // leak x110n exists to close; if the fixture ever stops exhibiting
    // it, the contrast below proves nothing and must be rebuilt.
    val straddling = labeledPairs("x110_group_split")
      .filter(col("split_a") =!= col("split_b"))
    assert(straddling.count() > 0,
      "no near-dup pair straddles the content split on this corpus — " +
        "the x110n contrast fixture is vacuous")
    // and every straddling pair is a genuine NEAR dup (j < 1): byte
    // equality implies equal content hash implies equal split
    assert(straddling.filter(col("jaccard") >= 1.0).count() == 0)
  }

  test("x110n's cluster split admits NO near-dup pair across splits") {
    assert(labeledPairs("x110n_cluster_group_split")
      .filter(col("split_a") =!= col("split_b")).count() == 0)
  }

  test("x110ng gate is the same audit and is empty") {
    assert(q("x110ng_cluster_leakage_gate").count() == 0)
  }

  test("x110n assigns every doc exactly one split and all three splits exist") {
    val s = q("x110n_cluster_group_split")
    assert(s.groupBy(col("id")).count().filter(col("count") > 1).count() == 0)
    assert(s.select(col("split")).distinct().count() == 3)
  }

  test("exact duplicates still share a split under the cluster key") {
    // the escalation must not lose the x110 guarantee: byte-equal
    // copies are jaccard-1.0 pairs, so they cluster together and
    // inherit one root — check directly on the +10000 exact-copy ids
    val s = q("x110n_cluster_group_split")
    val leaked = s.filter(col("id") >= 10000 && col("id") < 20000)
      .select((col("id") - 10000).as("id"), col("split").as("copy_split"))
      .join(s, Seq("id"))
      .filter(col("copy_split") =!= col("split"))
    assert(leaked.count() == 0)
  }
}
