package graft

import org.apache.spark.sql.functions._
import graft.operators.PiiQueries

/** Corpus-hygiene family: PII scan/redaction known values and the
  * rare-token ratio against a hand-computed corpus.
  */
class PiiQueriesSpec extends SparkSpecBase {
  import spark.implicits._

  test("luhnValid agrees with an independent Scala implementation") {
    // classic Luhn reference number plus generated neighbors
    def luhnScala(s: String): Boolean = {
      val sum = s.reverse.zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      sum % 10 == 0
    }
    val nums = Seq("79927398713", "79927398714", "4444444444444448",
      "4444444444444449", "444444444444123" + "0", "0000000000000000")
    val got = nums.toDF("n").select($"n", PiiQueries.luhnValid($"n").as("v"))
      .as[(String, Boolean)].collect().toMap
    nums.foreach(n => assert(got(n) === luhnScala(n), s"luhn($n)"))
    assert(got("79927398713"), "the canonical Luhn example must validate")
  }

  test("luhnCheckDigit completes any 15-digit payload to a valid number") {
    val payloads = Seq("444444444444123", "000000000000001", "999999999999999")
    val out = payloads.toDF("p")
      .select(concat($"p", PiiQueries.luhnCheckDigit($"p").cast("string")).as("n"))
      .select($"n", PiiQueries.luhnValid($"n").as("v"))
      .as[(String, Boolean)].collect()
    assert(out.forall(_._2), s"all completions must validate: ${out.toSeq}")
  }

  test("x55: checksum separates planted valid cards from off-by-one fakes") {
    val rows = PiiQueries.queries("x55_luhn_scan")(spark, sfDir)
      .as[(Long, Int, Int)].collect().toSeq
    val byId = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    rows.foreach { case (id, cand, valid) =>
      val expCand = (if (id % 5 == 0) 1 else 0) + (if (id % 7 == 0) 1 else 0)
      assert(cand === expCand, s"doc $id candidate count")
      assert(valid === (if (id % 5 == 0) 1 else 0), s"doc $id valid count")
    }
    assert(byId.nonEmpty)
  }

  test("piiCounts: emails, IPv4s, phones counted independently") {
    val docs = Seq(
      (1L, "mail a@b.com and c.d+x@e.org, ip 10.0.0.1, call 555-0123-4567"),
      (2L, "no pii here at all"),
      (3L, "two ips 192.168.1.1 8.8.8.8 one mail z@y.io")
    ).toDF("doc_id", "text")
    val rows = PiiQueries.piiCounts(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Int, Int, Int, Int)].collect().toSeq
    assert(rows === Seq((1L, 2, 1, 1, 4), (2L, 0, 0, 0, 0), (3L, 1, 2, 0, 3)))
  }

  test("redact replaces every match with its typed tag, order-independent") {
    val docs = Seq((1L, "a@b.com then 10.0.0.1 then 555-0123-4567 then a@b.com"))
      .toDF("doc_id", "text")
    val out = docs.select(PiiQueries.redact(col("text")).as("t"))
      .as[String].head()
    assert(out === "<EMAIL> then <IP> then <PHONE> then <EMAIL>")
  }

  test("piiCounts plans a pure scan-project: zero exchanges") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val plan = PiiQueries.piiCounts(docs, "doc_id", "text")
      .queryExecution.sparkPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty, s"$plan")
  }

  test("rareTokenRatio matches a hand-computed corpus") {
    // corpus: "a" x6, "b" x2, "c" x1, "d" x1  ->  N=10, V=4, mean=2.5
    // rare (c*V < N i.e. c < 2.5): b(2), c(1), d(1); frequent: a(6)
    val docs = Seq(
      (1L, "a a a b"),   // rare occurrences: 1 (b) of 4  -> 0.25
      (2L, "a a a b c"), // rare: b + c = 2 of 5          -> 0.4
      (3L, "d")          // rare: 1 of 1                  -> 1.0
    ).toDF("doc_id", "text")
    val r = PiiQueries.rareTokenRatio(docs, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(r === Map(1L -> 0.25, 2L -> 0.4, 3L -> 1.0))
  }

  test("rareTokenRatio joins on token only, with pre-aggregated probe side") {
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec, BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val docs = (1L to 50L).map(i => (i, s"the the the u$i")).toDF("doc_id", "text")
    val q = PiiQueries.rareTokenRatio(docs, "doc_id", "text")
    val plan = q.queryExecution.sparkPlan
    // no nested-loop / cartesian from the N,V scalars (driver-collected)
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty)
    assert(plan.collect { case j: CartesianProductExec => j }.isEmpty)
    // the stop token "the" still yields exact values
    val r = q.as[(Long, Double)].collect().toMap
    // freqs: the=150, u_i=1 each; N=200, V=51, mean~3.9 -> u_i rare
    assert(r.values.forall(v => math.abs(v - 0.25) < 1e-9))
  }
}
