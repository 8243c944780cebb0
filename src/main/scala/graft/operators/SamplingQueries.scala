package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic content-hash sampling and train/val/test assignment —
  * the reproducibility pattern for training-data pipelines: membership
  * is a pure function of the row's key (md5 prefix range), so samples
  * and splits are identical across runs, engines, partitionings and
  * cluster sizes, need no RNG state or seed plumbing, and a row's split
  * never changes when the corpus around it grows. (Spark's sample()/
  * randomSplit() guarantee none of that — they are seed + partitioning
  * dependent.)
  *
  * The hash condition is a scan-level predicate: Catalyst evaluates it
  * in the same whole-stage-codegen pass as the parquet scan, so a 10%
  * sample reads 100% of rows but materializes/shuffles only its 10% —
  * and both engines agree on md5 of the decimal key string, which is
  * what makes these queries hash-green against DuckDB.
  */
object SamplingQueries {
  type Q = (SparkSession, String) => DataFrame

  /** First two hex chars of md5(key as decimal string) — 256 evenly
    * filled buckets, portable across engines as plain string compare.
    * Shared with every operator that must agree with the x22 split
    * (Contamination's decontamination check) — ONE definition.
    */
  private[graft] def hashPrefix(key: Column): Column =
    substring(md5(key.cast("string")), 1, 2)

  /** The x22 split bounds: train = '00'..TrainHi, val = ..ValHi,
    * test = above ValHi. Operators that slice by split reuse these so a
    * ratio retune cannot silently diverge.
    */
  private[graft] val TrainHi = "cb"
  private[graft] val ValHi = "e5"

  val queries: Map[String, Q] = base ++ stratified

  private lazy val base = Map[String, Q](
    // ~10% deterministic sample: prefix '00'..'19' = 26/256 buckets
    "x21_hash_sample" -> ((s, d) =>
      Tables(s, d, "documents")
        .filter(hashPrefix(col("doc_id")) <= "19")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // 80/10/10 train/val/test: '00'..'cb' / 'cc'..'e5' / 'e6'..'ff'
    "x22_split_assign" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"),
          when(hashPrefix(col("doc_id")) <= TrainHi, "train")
            .when(hashPrefix(col("doc_id")) <= ValHi, "val")
            .otherwise("test").as("split"))
        .orderBy(col("doc_id"))),

    // split sizes: proves the assignment is total and near the 80/10/10
    // target on real data
    "x22s_split_sizes" -> ((s, d) =>
      queries("x22_split_assign")(s, d)
        .groupBy(col("split")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("split"))),

    // Weighted priority sample (Efraimidis–Spirakis A-ES in its
    // exponential-clocks form): each doc gets key ln(u)/w with u a
    // 48-bit md5 uniform and w its whitespace token count (the x10
    // convention, already cross-engine hash-green); the top-k by key is
    // EXACTLY a w-weighted sample without replacement — the
    // deterministic, engine-portable weighted counterpart of x21 (the
    // op behind "sample 1B training tokens ∝ quality/length weight").
    // u is exact in both engines: a 48-bit integer is exactly
    // representable in a double and /2^48 is a power-of-two scale;
    // ranking uses the ROUNDED key (9 dp) with doc_id tiebreak so a
    // last-ulp ln() difference cannot flip the selection. Top-k plans
    // as TakeOrderedAndProject (per-partition heaps + driver merge,
    // the x42 shape) — never a global sort.
    "x104_weighted_sample" -> ((s, d) =>
      weightedSample(
        Tables(s, d, "documents")
          .select(col("doc_id"),
            TextAnalysis.tokenCount(col("text")).as("ws_tokens")),
        "doc_id", col("ws_tokens"), k = 100))
  )

  /** Efraimidis–Spirakis A-ES weighted sample without replacement
    * (exponential-clocks form): the top-k rows by key ln(u)/w, u a
    * 48-bit md5 uniform of the id — exactly a w-weighted sample, as
    * deterministic and partitioning/engine-portable as [[hashPrefix]].
    * Returns `docs` plus the rounded `priority` key, ordered
    * (priority desc, id) and limited to k.
    */
  def weightedSample(docs: DataFrame, idCol: String, weight: Column,
                     k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val v = conv(substring(md5(col(idCol).cast("string")), 1, 12),
      16, 10).cast("double")
    val u = (v + lit(0.5)) / lit(281474976710656.0) // 16^12 = 2^48
    docs.withColumn("priority", round(log(u) / weight, 9))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic stratified (class-balancing) sample: per-class keep
    * fractions expressed as per-class hash-prefix thresholds — here the
    * majority class ('en', ~44% of the corpus) is downsampled to
    * 86/256 ≈ 34% while minority classes keep every row, flattening the
    * language distribution. Same scan-level-predicate properties as
    * x21: no RNG, no shuffle, membership independent of partitioning
    * and corpus growth — the determinism Spark's stat.sampleBy (seeded
    * per-partition RNG) cannot give.
    */
  private lazy val stratified = Map[String, Q](
    "x27_stratified_sample" -> ((s, d) =>
      Tables(s, d, "documents")
        .filter(col("lang") =!= "en" || hashPrefix(col("doc_id")) <= "55")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // class sizes after balancing: the point of the operator, visible
    "x27s_class_sizes" -> ((s, d) =>
      queries("x27_stratified_sample")(s, d)
        .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang"))),

    // training-mix: even-numbered sources at 96/256 = 37.5%, odd at
    // 32/256 = 12.5% — the per-source weighting a dataset-mixing
    // config prescribes, as one deterministic scan predicate
    "x43_source_mix" -> ((s, d) =>
      sourceMix(Tables(s, d, "documents"), "doc_id", "source", MixWeights)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))),

    "x43s_mix_sizes" -> ((s, d) =>
      sourceMix(Tables(s, d, "documents"), "doc_id", "source", MixWeights)
        .groupBy(col("source")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("source")))
  )

  /** The declared x43 mix: srcN keeps 37.5% when N is even, 12.5% when
    * odd (weights chosen to be exact in 256ths).
    */
  private val MixWeights: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> (if (i % 2 == 0) 0.375 else 0.125)).toMap

  /** Deterministic dataset mixing: per-source keep fractions (a
    * training-mix config) as ONE hash-prefix scan predicate. A source
    * absent from `weights` contributes nothing; weight w keeps the
    * first round(w*256) of the 256 md5 buckets, so membership has the
    * x21/x27 properties — reproducible across runs, engines and
    * partitionings, stable under corpus growth, zero shuffle.
    */
  def sourceMix(docs: DataFrame, idCol: String, srcCol: String,
                weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      s"weights must be in [0,1]: $weights")
    // per-source inclusive upper bucket, "" for weight 0 (matches no
    // prefix — every md5 prefix is >= "00" > ""); sorted fold for a
    // deterministic CASE chain
    val bound = weights.toSeq.sortBy(_._1).foldLeft(lit("")) {
      case (acc, (s, w)) =>
        val k = math.round(w * 256).toInt
        when(col(srcCol) === s, lit(if (k <= 0) "" else f"${k - 1}%02x"))
          .otherwise(acc)
    }
    docs.filter(hashPrefix(col(idCol)) <= bound)
  }

  /** DuckDB has no hex→integer conversion, so the oracle expands the
    * 12-hex-char uniform as an explicit base-16 positional sum (12
    * strpos terms) — value-identical to Spark's conv(h, 16, 10).
    */
  private val hexSum: String = (0 until 12).map { i =>
    val pow = BigInt(16).pow(11 - i)
    s"(strpos('0123456789abcdef', substr(h, ${i + 1}, 1)) - 1) * $pow"
  }.mkString(" + ")

  val oracleSql: Map[String, String] = Map(
    "x104_weighted_sample" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS INT) AS ws_tokens,
         |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS h
         |  FROM documents
         |), p AS (
         |  SELECT doc_id, ws_tokens,
         |    round(ln((CAST($hexSum AS DOUBLE) + 0.5) / 281474976710656.0)
         |          / ws_tokens, 9) AS priority
         |  FROM t
         |)
         |SELECT doc_id, ws_tokens, priority FROM p
         |ORDER BY priority DESC, doc_id LIMIT 100""".stripMargin,

    "x21_hash_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '19'
        |ORDER BY doc_id""".stripMargin,

    "x22_split_assign" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'cb' THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'e5' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x22s_split_sizes" ->
      """SELECT split, count(*) AS cnt FROM (
        |  SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'cb' THEN 'train'
        |              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'e5' THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM documents
        |) GROUP BY split ORDER BY split""".stripMargin,

    "x27_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE lang <> 'en' OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '55'
        |ORDER BY doc_id""".stripMargin,

    "x27s_class_sizes" ->
      """SELECT lang, count(*) AS cnt FROM documents
        |WHERE lang <> 'en' OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '55'
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "x43_source_mix" ->
      """SELECT doc_id, source FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <=
        |  CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN '5f' ELSE '1f' END
        |ORDER BY doc_id""".stripMargin,

    "x43s_mix_sizes" ->
      """SELECT source, count(*) AS cnt FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <=
        |  CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN '5f' ELSE '1f' END
        |GROUP BY source ORDER BY source""".stripMargin
  )
}
