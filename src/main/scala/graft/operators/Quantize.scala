package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Per-vector symmetric int8 embedding quantization — the storage/
  * bandwidth step of a production vector pipeline: a 100 TB float32
  * embedding corpus shrinks 4x before it ever reaches the ANN
  * operators, and the dequantization error is bounded per element by
  * scale/2 (half a quantization step).
  *
  * Pure column expressions (array HOFs) in the scan-project stage — no
  * shuffle, no UDF. The declared query projects the codes as a
  * space-joined string and the scale as a double so every cell is a
  * sortable scalar (array cells crash the harness's pandas sort), and
  * is fully hash-checked against a DuckDB oracle: scale and each
  * x/scale division are IEEE double ops with exact float32 inputs, and
  * both engines round halves away from zero, so the integer codes are
  * bit-deterministic across engines. The x31g gate additionally
  * re-derives the guarantee the operator documents — every dequantized
  * element within scale/2 (+ float eps) of the original, every code in
  * [-127, 127], lengths preserved — with an empty-set DuckDB oracle
  * (the x17g pattern).
  */
object Quantize {
  type Q = (SparkSession, String) => DataFrame

  /** (id, scale, qvec): qvec[i] = round(emb[i] / scale) with
    * scale = max|emb| / 127; an all-zero vector quantizes to scale 0
    * and an all-zero code array (the division guard).
    */
  def quantize(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    // max|emb| binds ONCE through a lambda variable (the windowGrams
    // lesson): captured directly in the per-element lambda, the
    // array_max(transform(abs)) subtree would re-reduce the whole
    // vector per OUTPUT CODE under interpreted HOF eval — O(dim²) per
    // row on the quantize hot path
    val sq = element_at(transform(
      array(array_max(transform(col(embCol), x => abs(x))).cast("double")),
      ma => {
        val scale = ma / lit(127.0)
        struct(
          when(ma > 0, scale).otherwise(lit(0.0)).as("scale"),
          when(ma > 0,
              transform(col(embCol),
                x => round(x.cast("double") / scale).cast("int")))
            .otherwise(transform(col(embCol), _ => lit(0))).as("qvec"))
      }), 1)
    // two-step select: the struct is referenced twice, and a collapsed
    // single projection would evaluate it twice per row (CollapseProject
    // keeps non-cheap aliases materialized)
    df.select(col(idCol), sq.as("__sq"))
      .select(col(idCol), col("__sq").getField("scale").as("scale"),
        col("__sq").getField("qvec").as("qvec"))
  }

  /** Vectors violating the quantization contract against their
    * originals: dequantization error beyond scale/2 (+eps for the
    * float32->double element cast), a code outside int8 range, or a
    * length mismatch. Empty by construction for [[quantize]] output.
    */
  def contractViolations(orig: DataFrame, quant: DataFrame,
                         idCol: String, embCol: String): DataFrame = {
    val bound = col("scale") / 2 + lit(1e-6)
    orig.select(col(idCol), col(embCol)).join(quant, idCol)
      .select(col(idCol),
        exists(zip_with(col(embCol), col("qvec"),
            (e, q) => abs(q.cast("double") * col("scale") - e.cast("double")) > bound),
          b => b).as("bad_err"),
        exists(col("qvec"), q => abs(q) > 127).as("bad_range"),
        (size(col("qvec")) =!= size(col(embCol))).as("bad_len"))
      .filter(col("bad_err") || col("bad_range") || col("bad_len"))
  }

  val queries: Map[String, Q] = Map(
    // declared shape: scalar columns only (vec_id, scale, qcodes string);
    // the raw-array quantize() API stays for engine callers (ANN etc.)
    "x31_quantize_embeddings" -> ((s, d) =>
      quantize(Tables(s, d, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), col("scale"),
          array_join(col("qvec"), " ").as("qcodes"))
        .orderBy(col("vec_id"))),

    "x31g_quantize_gate" -> ((s, d) => {
      val e = Tables(s, d, "embeddings")
      contractViolations(e, quantize(e, "vec_id", "embedding"),
          "vec_id", "embedding")
        .orderBy(col("vec_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "x31_quantize_embeddings" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |         -- abs over exact float32->double promotions: bit-identical
        |         -- to the engine's array_max(transform(abs)).cast(double)
        |         list_max(list_transform(embedding,
        |           x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s0
        |  FROM embeddings
        |)
        |SELECT vec_id,
        |  CASE WHEN s0 > 0 THEN s0 ELSE 0.0 END AS scale,
        |  CASE WHEN s0 > 0
        |       THEN array_to_string(list_transform(embedding,
        |              x -> CAST(round(CAST(x AS DOUBLE) / s0) AS INTEGER)), ' ')
        |       ELSE array_to_string(list_transform(embedding, x -> 0), ' ')
        |  END AS qcodes
        |FROM s""".stripMargin,

    "x31g_quantize_gate" ->
      """SELECT CAST(NULL AS BIGINT) AS vec_id,
        |  CAST(NULL AS BOOLEAN) AS bad_err,
        |  CAST(NULL AS BOOLEAN) AS bad_range,
        |  CAST(NULL AS BOOLEAN) AS bad_len
        |WHERE false""".stripMargin
  )
}
