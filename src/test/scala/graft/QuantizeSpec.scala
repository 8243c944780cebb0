package graft

import org.apache.spark.sql.functions._
import graft.operators.Quantize

/** Int8 embedding quantization: known codes, zero-vector guard, and the
  * contract gate — including that a tampered code fires it.
  */
class QuantizeSpec extends SparkSpecBase {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1.0f, -0.5f, 0.25f)),
    (2L, Seq(0.0f, 0.0f, 0.0f)),      // zero vector: scale 0, codes 0
    (3L, Seq(-2.0f, 2.0f, 1.0f))).toDF("vec_id", "embedding")

  test("quantize: max|e| maps to ±127, zero vector guarded") {
    val q = Quantize.quantize(vecs, "vec_id", "embedding")
      .orderBy("vec_id")
      .as[(Long, Double, Seq[Int])].collect().toSeq
    assert(q(0)._3 === Seq(127, -64, 32)) // scale 1/127; -0.5*127 = -63.5 -> -64
    assert(math.abs(q(0)._2 - 1.0 / 127.0) < 1e-12)
    assert(q(1)._2 === 0.0 && q(1)._3 === Seq(0, 0, 0))
    assert(q(2)._3 === Seq(-127, 127, 64)) // scale 2/127; 1.0/scale = 63.5 -> 64
  }

  test("gate: clean quantization yields no violations; a tampered code fires") {
    val q = Quantize.quantize(vecs, "vec_id", "embedding")
    assert(Quantize.contractViolations(vecs, q, "vec_id", "embedding").count() === 0)

    val tampered = q.withColumn("qvec",
      when($"vec_id" === 3L, transform($"qvec", c => c + 2)).otherwise($"qvec"))
    val bad = Quantize.contractViolations(vecs, tampered, "vec_id", "embedding")
      .select("vec_id").as[Long].collect().toSeq
    assert(bad === Seq(3L)) // +2 codes: error > scale/2 AND |−127+2... 129| > 127
  }

  test("quantized vectors dequantize into the similarity operators") {
    // dequant = qvec * scale, usable directly as array<float> embeddings
    val deq = Quantize.quantize(vecs, "vec_id", "embedding")
      .filter($"vec_id" =!= 2L) // cosine needs nonzero norm
      .select($"vec_id",
        transform($"qvec", c => (c.cast("double") * $"scale").cast("float"))
          .as("embedding"))
    val top = graft.operators.Similarity.bruteForceTopK(
        deq.filter($"vec_id" === 1L), deq, "vec_id", "embedding", k = 1)
      .select("qid", "nid").as[(Long, Long)].collect().head
    // nearest non-self neighbor of v1 by cosine survives quantization
    assert(top._1 === 1L && top._2 === 3L)
  }
}
