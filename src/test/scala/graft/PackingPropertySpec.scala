package graft

import org.scalacheck.{Gen, rng}
import graft.operators.PackingQueries

/** Property-based checks for the sequence-shaping family against
  * from-first-principles reference computations on scalacheck-generated
  * corpora (fixed seeds — deterministic).
  *
  *  - packSequences must equal a sequential per-shard fold: each doc's
  *    (bin, offset) is exactly (prior-token-sum / budget,
  *    prior-token-sum % budget) over the shard's id-ordered docs.
  *  - chunkOverlap must cover every token, respect the width bound,
  *    and start chunks exactly stride apart.
  *  - repetitionRatio must equal 1 - distinct/total trigrams computed
  *    naively, and stay within [0, 1).
  */
class PackingPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val vocab =
    Vector("w1", "w2", "w3", "w4", "w5", "w6", "w7", "w8")

  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(4, 16)
    ids <- Gen.listOfN(n, Gen.choose(0L, 999L)).map(_.distinct)
    docs <- Gen.sequence[Seq[(Long, String)], (Long, String)](ids.map { id =>
      for {
        len <- Gen.choose(1, 30)
        ws <- Gen.listOfN(len, Gen.oneOf(vocab))
      } yield (id, ws.mkString(" "))
    })
  } yield docs

  private def nTok(text: String): Int =
    text.trim.split("\\s+").count(_.nonEmpty)

  test("packSequences equals the sequential per-shard fold on random corpora") {
    val budget = 7
    val shards = 3
    for (s <- 1L to 10L) {
      val corpus = corpusGen.pureApply(Gen.Parameters.default, rng.Seed(s))
      val expected = corpus.groupBy(_._1 % shards).flatMap { case (shard, docs) =>
        docs.sortBy(_._1).foldLeft((0L, Seq.empty[(Long, Int, Long, Long, Long)])) {
          case ((cum, acc), (id, text)) =>
            val n = nTok(text)
            (cum + n, acc :+ ((id, n, shard, cum / budget, cum % budget)))
        }._2
      }.toSeq.sortBy(_._1)
      val got = PackingQueries.packSequences(
          corpus.toDF("doc_id", "text"), "doc_id", "text", budget, shards)
        .orderBy("doc_id")
        .as[(Long, Int, Long, Long, Long)].collect().toSeq
      assert(got === expected, s"seed $s")
    }
  }

  test("chunkOverlap covers every token within width, starts stride apart") {
    val width = 5
    val stride = 3
    for (s <- 1L to 10L) {
      val corpus = corpusGen.pureApply(Gen.Parameters.default, rng.Seed(s))
      val chunks = PackingQueries.chunkOverlap(
          corpus.toDF("doc_id", "text"), "doc_id", "text", width, stride)
        .as[(Long, Int, String)].collect().toSeq
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      corpus.foreach { case (id, text) =>
        val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
        val cs = chunks(id)
        // chunk ids are 0,1,2,... (starts exactly stride apart)
        assert(cs.map(_._2) === cs.indices.toSeq, s"seed $s id $id")
        // each chunk is the exact width-bounded slice at its start
        cs.foreach { case (_, cid, chunk) =>
          assert(chunk.split(" ").toSeq ===
            toks.slice(cid * stride, cid * stride + width), s"seed $s id $id")
        }
        // union of chunks covers the whole document
        assert(cs.flatMap(_._3.split(" ")).toSet === toks.toSet, s"seed $s id $id")
      }
    }
  }

  test("repetitionRatio equals the naive trigram computation, bounded in [0,1)") {
    for (s <- 1L to 10L) {
      val corpus = corpusGen.pureApply(Gen.Parameters.default, rng.Seed(s))
      val got = PackingQueries.repetitionRatio(
          corpus.toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, Double)].collect().toMap
      corpus.foreach { case (id, text) =>
        val ts = text.trim.split("\\s+").filter(_.nonEmpty).toVector
        val grams = (1 to math.max(ts.length - 2, 1))
          .map(i => ts.slice(i - 1, math.min(i + 2, ts.length)).mkString(" "))
        val want = 1.0 - grams.distinct.size.toDouble / grams.size
        assert(math.abs(got(id) - want) < 1e-6, s"seed $s id $id")
        assert(got(id) >= 0.0 && got(id) < 1.0, s"seed $s id $id")
      }
    }
  }
}
