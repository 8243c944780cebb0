package graft

import org.scalacheck.{Gen, rng}
import graft.operators.Contamination

/** Window-overlap operators against naive reference computations on
  * scalacheck-generated corpora (fixed seeds — deterministic). Small
  * vocabularies force real cross-document window collisions.
  */
class ContaminationPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val vocab = Vector("a", "b", "c", "d")
  private val K = 3

  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(3, 10)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 12)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  /** Mirrors tokenWindows: distinct k-token windows, whole-doc window
    * when shorter than k.
    */
  private def windows(text: String): Set[String] = {
    val ts = text.trim.split("\\s+").filter(_.nonEmpty).toVector
    (1 to math.max(ts.length - (K - 1), 1))
      .map(i => ts.slice(i - 1, math.min(i - 1 + K, ts.length)).mkString(" "))
      .toSet
  }

  test("dupWindowFrac equals the naive shared-window fraction") {
    for (s <- 1L to 12L) {
      val corpus = corpusGen.pureApply(Gen.Parameters.default, rng.Seed(s))
      val wsets = corpus.map { case (id, t) => id -> windows(t) }.toMap
      val got = Contamination.dupWindowFrac(
          corpus.toDF("doc_id", "text"), "doc_id", "text", K)
        .as[(Long, Double)].collect().toMap
      corpus.foreach { case (id, _) =>
        val mine = wsets(id)
        val others = (wsets - id).values.flatten.toSet
        val want = mine.count(others.contains).toDouble / mine.size
        assert(math.abs(got(id) - want) < 1e-6, s"seed $s id $id")
      }
    }
  }

  test("decontamination equals the naive train-membership fraction") {
    for (s <- 1L to 12L) {
      val corpus = corpusGen.pureApply(Gen.Parameters.default, rng.Seed(s))
      val (train, eval_) = corpus.partition(_._1 % 2 == 0)
      if (train.nonEmpty && eval_.nonEmpty) {
        val trainW = train.flatMap(d => windows(d._2)).toSet
        val got = Contamination.decontamination(
            eval_.toDF("doc_id", "text"), train.toDF("doc_id", "text"),
            "doc_id", "text", K)
          .as[(Long, Double)].collect().toMap
        eval_.foreach { case (id, t) =>
          val mine = windows(t)
          val want = mine.count(trainW.contains).toDouble / mine.size
          assert(math.abs(got(id) - want) < 1e-6, s"seed $s id $id")
        }
      }
    }
  }
}
