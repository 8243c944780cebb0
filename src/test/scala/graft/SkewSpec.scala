package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** saltedJoin: exact equivalence with the plain join (also oracle-gated
  * as x20) and the spread property that justifies it — a hot key's rows
  * land in several (key, salt) groups instead of one.
  */
class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedJoin equals the plain inner join") {
    val probe = Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey".as("k"), $"l_linenumber", $"l_extendedprice")
    val build = Tables(spark, sfDir, "orders")
      .select($"o_orderkey".as("k"), $"o_custkey")
    val salted = Skew.saltedJoin(probe, build, "k", nSalt = 8)
    val plain = probe.join(build, Seq("k"))
    assert(salted.columns.toSeq === plain.columns.toSeq)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt spreads a hot key across groups, deterministically") {
    // one key, 10k distinct rows: unsalted it is a single group
    val hot = spark.range(10000).select(lit(1L).as("k"), $"id")
    val build = Seq((1L, "x")).toDF("k", "v")
    val perSalt = Skew.saltedJoin(hot, build, "k", nSalt = 8)
    val spread = hot.withColumn("__salt",
        pmod(xxhash64(struct(col("k"), col("id"))), lit(8)))
      .groupBy($"__salt").count().collect()
    assert(spread.length == 8, "all 8 salt buckets populated")
    assert(spread.map(_.getLong(1)).max < 10000 / 4,
      "no salt bucket holds a quarter of the hot key")
    // deterministic: same data -> same salt assignment, twice
    assert(perSalt.count() === 10000)
    assert(perSalt.count() === 10000)
  }

  test("nSalt=1 degenerates to the plain join") {
    val probe = Seq((1L, "a"), (2L, "b")).toDF("k", "pv")
    val build = Seq((1L, "X"), (3L, "Z")).toDF("k", "bv")
    val out = Skew.saltedJoin(probe, build, "k", 1)
      .as[(Long, String, String)].collect().toSet
    assert(out === Set((1L, "a", "X")))
  }

  test("saltedJoinHot equals the plain join; cold keys stay unsalted") {
    // key 1 is hot (5k probe rows); keys 2..100 are cold
    val probe = spark.range(5000).select(lit(1L).as("k"), $"id")
      .unionByName(spark.range(2, 101).select($"id".as("k"), $"id"))
    val build = spark.range(1, 101).select($"id".as("k"),
      concat(lit("v"), $"id").as("bv"))
    val hot = Seq(1L).toDF("k")
    val out = Skew.saltedJoinHot(probe, build, "k", nSalt = 8, hotKeys = hot)
    val plain = probe.join(build, Seq("k"))
    assert(out.count() === plain.count())
    assert(out.exceptAll(plain).isEmpty && plain.exceptAll(out).isEmpty)
    // build replication: ONLY the hot key is copied nSalt times —
    // 100 build rows become 100 + 7, not 800
    val rep = Skew.replicateHotBuild(build, "k", 8, hot)
    assert(rep.count() === 100 + 7)
    assert(rep.filter($"k" === 1L).count() === 8)
    assert(rep.filter($"k" =!= 1L).groupBy($"k").count()
      .filter($"count" =!= 1L).count() === 0, "every cold key single-copy")
    // probe salting: cold rows all salt 0, the hot key spreads
    val salted = Skew.probeWithHotSalt(probe, "k", 8, hot)
    assert(salted.filter($"k" =!= 1L && $"__salt" =!= 0).count() === 0)
    assert(salted.filter($"k" === 1L).select($"__salt").distinct().count() === 8)
  }

  test("saltedJoinHot with an empty hot set is the plain join, unreplicated") {
    val probe = Seq((1L, "a"), (2L, "b")).toDF("k", "pv")
    val build = Seq((1L, "X"), (3L, "Z")).toDF("k", "bv")
    val none = spark.emptyDataset[Long].toDF("k")
    val out = Skew.saltedJoinHot(probe, build, "k", 8, none)
      .as[(Long, String, String)].collect().toSet
    assert(out === Set((1L, "a", "X")))
    assert(Skew.replicateHotBuild(build, "k", 8, none).count() === 2)
  }
}
