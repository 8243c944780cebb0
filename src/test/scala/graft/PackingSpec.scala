package graft

import graft.operators.PackingQueries

/** Sequence packing, overlapped chunking, repetition ratio: semantic
  * properties on crafted documents (the declared queries are separately
  * DuckDB-hash-checked at sf0.01 by the driver gate).
  */
class PackingSpec extends SparkSpecBase {
  import spark.implicits._

  test("packSequences: tokens flow contiguously, offsets bounded by the budget") {
    // one shard (ids all ≡ 1 mod 8), budget 10; token counts 4, 7, 3, 9
    val docs = Seq(
      (1L, "a b c d"), (9L, "a b c d e f g"),
      (17L, "x y z"), (25L, "p q r s t u v w x")).toDF("doc_id", "text")
    val out = PackingQueries.packSequences(docs, "doc_id", "text",
        budget = 10, shards = 8)
      .orderBy("doc_id")
      .select("doc_id", "n_tok", "shard", "bin", "bin_offset")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    // cumulative starts: 0, 4, 11, 14 -> bins 0,0,1,1; offsets 0,4,1,4
    assert(out === Seq(
      (1L, 4, 1L, 0L, 0L), (9L, 7, 1L, 0L, 4L),
      (17L, 3, 1L, 1L, 1L), (25L, 9, 1L, 1L, 4L)))
    // every offset is inside the pack, and each doc starts exactly where
    // the previous one ended (offset+n_tok ≡ next offset mod budget)
    out.foreach { case (_, _, _, _, off) => assert(off >= 0 && off < 10) }
    out.sliding(2).foreach {
      case Seq((_, n, _, _, off), (_, _, _, _, off2)) =>
        assert((off + n) % 10 === off2)
      case _ =>
    }
  }

  test("packSequences: shards pack independently") {
    val docs = Seq((0L, "a b"), (8L, "c d"), (1L, "e f")).toDF("doc_id", "text")
    val out = PackingQueries.packSequences(docs, "doc_id", "text", 512, 8)
      .orderBy("doc_id").select("doc_id", "shard", "bin_offset")
      .as[(Long, Long, Long)].collect().toSeq
    // shard 0 holds ids 0 and 8 (offsets 0 then 2); shard 1 restarts at 0
    assert(out === Seq((0L, 0L, 0L), (1L, 1L, 0L), (8L, 0L, 2L)))
  }

  test("chunkOverlap: stride windows overlap and reconstruct the document") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = PackingQueries.chunkOverlap(docs, "doc_id", "text",
        width = 4, stride = 3)
      .orderBy("chunk_id").select("chunk_id", "chunk")
      .as[(Int, String)].collect().toSeq
    assert(chunks === Seq(
      (0, "w1 w2 w3 w4"), (1, "w4 w5 w6 w7"), (2, "w7 w8 w9 w10"), (3, "w10")))
    // adjacent chunks share width - stride = 1 token
    chunks.sliding(2).foreach {
      case Seq((_, a), (_, b)) =>
        assert(a.split(" ").last === b.split(" ").head)
      case _ =>
    }
    // striding the starts re-covers every token exactly
    val rebuilt = chunks.flatMap(_._2.split(" ").take(3)).distinct
    assert(rebuilt === text.split(" ").toSeq)
  }

  test("chunkOverlap: whitespace-only documents are dropped, short docs chunk whole") {
    val docs = Seq((1L, "   "), (2L, "only two")).toDF("doc_id", "text")
    val chunks = PackingQueries.chunkOverlap(docs, "doc_id", "text", 64, 48)
      .select("doc_id", "chunk").as[(Long, String)].collect().toSeq
    assert(chunks === Seq((2L, "only two")))
  }

  test("repetitionRatio: 0 for all-distinct, rises with repeated trigrams") {
    val docs = Seq(
      (1L, "a b c d e f"),                 // 4 distinct trigrams / 4
      (2L, "x y z x y z x y z x y z"),     // heavy repetition
      (3L, "one two")).toDF("doc_id", "text") // degenerate: 1 short gram
    val r = PackingQueries.repetitionRatio(docs, "doc_id", "text")
      .orderBy("doc_id").select("doc_id", "rep_ratio")
      .as[(Long, Double)].collect().toMap
    assert(r(1L) === 0.0)
    // 12 tokens -> 10 grams, 3 distinct -> 1 - 3/10
    assert(r(2L) === 0.7)
    assert(r(3L) === 0.0)
  }

  test("shuffleOrder: total, per-shard positions dense, seed-stable, seed-sensitive") {
    val docs = (0L until 200L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val a = PackingQueries.shuffleOrder(docs, "doc_id", shards = 4, seed = 1L)
      .as[(Long, Long, Long)].collect().toSeq
    // every doc exactly once
    assert(a.map(_._1).sorted === (0L until 200L))
    // positions within each shard are 1..n with no gaps
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted === (1L to rows.length))
    }
    // same seed -> identical assignment even under different partitioning
    val a2 = PackingQueries.shuffleOrder(docs.repartition(7), "doc_id",
        shards = 4, seed = 1L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(a.toSet === a2.toSet)
    // a different seed is a genuinely different permutation
    val b = PackingQueries.shuffleOrder(docs, "doc_id", shards = 4, seed = 2L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(a.toSet !== b.toSet)
  }
}
