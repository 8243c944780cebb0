package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions.tokens

/** Corpus-hygiene operators for training-data pipelines (public-recipe
  * family: C4/RefinedWeb-style PII handling, Gopher-style rare-token
  * quality signals):
  *
  *  - [[piiCounts]] / [[redact]]: per-document counts of
  *    email/IPv4/phone matches and a redaction rewrite. Pure
  *    scan-project regex expressions (codegen'd, zero shuffle at any
  *    scale). Patterns are dialect-neutral (no backrefs/lookarounds) so
  *    the Java-regex engine side and the RE2 DuckDB oracle agree
  *    match-for-match.
  *  - [[luhnValid]]: checksum-verified credit-card detection (x55) —
  *    regex candidates filtered through the Luhn check as integer HOF
  *    expressions, still scan-only; the checksum is what keeps a
  *    16-digit id or timestamp from redacting as a card.
  *  - [[rareTokenRatio]]: fraction of a document's token OCCURRENCES
  *    whose corpus frequency is below the mean token frequency — the
  *    "too many rare tokens" low-quality signal. The rare predicate is
  *    integer-exact (`c * V < N` in exact decimal/hugeint arithmetic —
  *    no float threshold to disagree across engines, no Long overflow
  *    at web-scale corpus sizes).
  *
  * The synthetic `documents` text contains no natural PII, so the
  * declared PII queries deterministically AUGMENT each document from
  * its doc_id (same expression in the DuckDB oracle) — counts then
  * vary per document and the hash check is meaningful rather than
  * all-zeros.
  */
object PiiQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Dialect-neutral PII patterns (identical semantics in Java regex and
    * RE2): no backreferences, no lookaround, ASCII classes only.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}-\\d{4}\\b"
  val CardRe = "\\b\\d{16}\\b"

  /** Luhn checksum validity of a digit string — the checksum half of
    * credit-card detection (a bare \d{16} scan false-positives on ids
    * and timestamps; ~90% of random digit runs fail Luhn). Pure integer
    * HOF expressions: from the RIGHT, every second digit doubles
    * (minus 9 past 9) and the total must divide by 10.
    */
  def luhnValid(num: Column): Column = {
    val ds = transform(regexp_extract_all(num, lit("."), lit(0)), (c, i) => {
      val d = c.cast("int")
      // 0-based i from the left; from-right position = length - i, and
      // doubling hits even from-right positions (the 2nd, 4th, ...)
      when((length(num) - i) % 2 === 0,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    aggregate(ds, lit(0), (a, x) => a + x) % 10 === 0
  }

  /** Check digit completing a 15-digit payload to a Luhn-valid 16-digit
    * number (used by the deterministic augmentation; the oracle builds
    * the same digit independently).
    */
  def luhnCheckDigit(b15: Column): Column = {
    val ds = transform(regexp_extract_all(b15, lit("."), lit(0)), (c, i) => {
      val d = c.cast("int")
      // digit i (0-based from left) sits at from-right position 16 - i
      // of the final number: doubled exactly when i is even
      when(i % 2 === 0,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    (lit(10) - aggregate(ds, lit(0), (a, x) => a + x) % 10) % 10
  }

  /** (id, n_email, n_ipv4, n_phone, n_pii) — one scan, no shuffle. */
  def piiCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val e = regexp_count(t, lit(EmailRe))
    val i = regexp_count(t, lit(Ipv4Re))
    val p = regexp_count(t, lit(PhoneRe))
    docs.select(col(idCol), e.as("n_email"), i.as("n_ipv4"), p.as("n_phone"),
      (e + i + p).as("n_pii"))
  }

  /** Redaction rewrite: emails, then IPv4s, then phones, to typed
    * placeholder tags. The patterns are mutually non-overlapping by
    * construction (emails carry '@', phones carry '-' groups IPv4
    * lacks), so application order cannot change the result.
    */
  def redact(textCol: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(textCol, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** (id, rare_ratio): per document, the fraction of token occurrences
    * whose corpus frequency c is below the mean frequency (c * V < N in
    * exact integers; V = vocab size, N = total occurrences).
    *
    * Shape at 100 TB: both aggregations are map-side-combinable (a
    * corpus-wide stop token reaches each reducer as one partial row per
    * map task). The frequency join keys on token with per-doc
    * pre-aggregation on the probe side, so a stop token contributes ONE
    * row per containing document and the join output is 1:1 —
    * placement skew only, which AQE's skew split re-balances (the
    * head-of-Zipf vocabulary is also small enough to broadcast as an
    * alternative). N and V are two driver-side longs (bounded control
    * path) rather than a 1-row broadcast, keeping nested-loop shapes
    * out of the plan.
    */
  def rareTokenRatio(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // checkpoint the EXPLODED aggregation: it feeds both the frequency
    // build and the join probe, and the full-corpus tokenize+explode is
    // the expensive pass that must run once, not twice
    // explode_outer + not-null, NOT inner explode: the inner form lets
    // InferFiltersFromGenerate push a size(tokens(text)) > 0 predicate
    // to the scan, evaluating the tokenize expression TWICE per row
    // (the Dedup.shingleTable convention)
    val perDoc = docs
      .select(col(idCol).as("id"), explode_outer(tokens(col(textCol))).as("tok"))
      .filter(col("tok").isNotNull)
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("c_local"))
      .localCheckpoint(true)
    val freq = perDoc.groupBy(col("tok")).agg(sum(col("c_local")).as("c"))
    val totals = freq.agg(sum(col("c")).as("n"), count(lit(1)).as("v")).head()
    // sum() over zero rows is NULL: an empty (or all-null-text) corpus
    // has no ratios to report — return the empty frame, not an NPE
    if (totals.isNullAt(0))
      return perDoc.select(col("id"), lit(0.0).as("rare_ratio")).limit(0)
    val n = totals.getLong(0)
    val v = totals.getLong(1)
    // decimal(38,0) product: exact (like the bigints it replaces) and
    // overflow-proof — c up to ~1e13 times v up to ~1e9 exceeds Long
    // range at web scale, and ANSI mode would kill the query
    val rare = col("c").cast("decimal(38,0)") * lit(v) < lit(n)
    perDoc.join(freq, "tok")
      .groupBy(col("id"))
      .agg(round(
        sum(when(rare, col("c_local")).otherwise(lit(0L))).cast("double") /
          sum(col("c_local")).cast("double"), 6).as("rare_ratio"))
  }

  /** Deterministic PII augmentation of the synthetic corpus: always an
    * email, an IPv4 on even ids, a phone on ids divisible by 3 — the
    * SAME expression the DuckDB oracle builds, so counts vary per doc.
    */
  private def augmented(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(
      col("text"),
      lit(" contact u"), col("doc_id").cast("string"), lit("@example.com"),
      when(col("doc_id") % 2 === 0, concat(
        lit(" from 10."), (col("doc_id") % 256).cast("string"),
        lit(".0."), ((col("doc_id") * 7) % 256).cast("string")))
        .otherwise(lit("")),
      when(col("doc_id") % 3 === 0, lit(" call 555-0123-4567"))
        .otherwise(lit(""))))

  /** Card augmentation for x55: docs with id % 5 == 0 carry a VALID
    * Luhn 16-digit number built from the id, id % 7 == 0 an INVALID one
    * (check digit off by one) — so the checksum, not the regex, decides.
    */
  private def cardAugmented(docs: DataFrame): DataFrame = {
    val base = lpad(col("doc_id").cast("string"), 15, "4")
    docs.withColumn("text", concat(
      col("text"),
      when(col("doc_id") % 5 === 0,
        concat(lit(" card "), base, luhnCheckDigit(base).cast("string")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" ref "), base,
          ((luhnCheckDigit(base) + 1) % 10).cast("string")))
        .otherwise(lit(""))))
  }

  val queries: Map[String, Q] = Map(
    // Checksum-verified card scan: regex candidates, then the Luhn
    // filter — counts per doc stay integer-exact, zero shuffle.
    "x55_luhn_scan" -> ((s, d) => {
      val cands = regexp_extract_all(col("text"), lit(CardRe), lit(0))
      cardAugmented(Tables(s, d, "documents"))
        .select(col("doc_id"),
          size(cands).as("n_card_candidates"),
          size(filter(cands, luhnValid(_))).as("n_luhn_valid"))
        .orderBy(col("doc_id"))
    }),

    "x35_pii_scan" -> ((s, d) =>
      piiCounts(augmented(Tables(s, d, "documents")), "doc_id", "text")
        .orderBy(col("doc_id"))),

    "x36_pii_redact" -> ((s, d) =>
      augmented(Tables(s, d, "documents"))
        .select(col("doc_id"), md5(redact(col("text"))).as("redacted_md5"))
        .orderBy(col("doc_id"))),

    "x37_rare_token_ratio" -> ((s, d) =>
      rareTokenRatio(Tables(s, d, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))),

    // HTML-to-text extraction (the WARC/CommonCrawl reduction): each
    // document is wrapped in deterministic HTML noise — script/style
    // blocks, a comment, entities — on BOTH engines, then reduced back
    // to text; md5 of the extraction is hash-checked
    "x39_html_extract" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"), concat(
          lit("<html><head><style>p{color:red}</style>" +
            "<script>var x=1;</script></head><body><h1>Doc "),
          col("doc_id").cast("string"),
          lit("</h1><p>"), col("text"),
          lit("</p><!-- hidden --> &amp; &lt;tail&gt;</body></html>"))
          .as("html"))
        .select(col("doc_id"),
          md5(TextAnalysis.htmlToText(col("html"))).as("text_md5"))
        .orderBy(col("doc_id")))
  )

  // shared augmentation SQL fragment (DuckDB string concat)
  private val Aug =
    """text || ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com' ||
      |  CASE WHEN doc_id % 2 = 0
      |       THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
      |            CAST((doc_id * 7) % 256 AS VARCHAR)
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 3 = 0 THEN ' call 555-0123-4567' ELSE '' END""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // Luhn recomputed from scratch in SQL (generate_series digit walk,
    // no lambda-index dependence): payload digit at 1-based i sits at
    // from-right position 17-i of the 16-digit number, so doubling
    // lands on odd i in both the check-digit build and the validation.
    "x55_luhn_scan" ->
      """WITH base AS (
        |  SELECT doc_id, text, lpad(CAST(doc_id AS VARCHAR), 15, '4') AS b15
        |  FROM documents
        |), chk AS (
        |  SELECT doc_id,
        |    CAST((10 - sum(CASE WHEN i % 2 = 1
        |                        THEN CASE WHEN d * 2 > 9 THEN d * 2 - 9 ELSE d * 2 END
        |                        ELSE d END) % 10) % 10 AS INT) AS cd
        |  FROM (
        |    SELECT doc_id, CAST(cs[i] AS INT) AS d, i
        |    FROM (SELECT doc_id, regexp_extract_all(b15, '.') AS cs FROM base),
        |         unnest(generate_series(1, 15)) AS u(i)
        |  ) GROUP BY doc_id
        |), aug AS (
        |  SELECT b.doc_id,
        |    b.text ||
        |    CASE WHEN b.doc_id % 5 = 0
        |         THEN ' card ' || b.b15 || CAST(c.cd AS VARCHAR) ELSE '' END ||
        |    CASE WHEN b.doc_id % 7 = 0
        |         THEN ' ref ' || b.b15 || CAST((c.cd + 1) % 10 AS VARCHAR) ELSE '' END AS text
        |  FROM base b JOIN chk c USING (doc_id)
        |), cand AS (
        |  -- the synthetic candidates within one doc are always distinct
        |  -- (valid vs off-by-one check digit), so (doc_id, num) is a key
        |  SELECT doc_id, unnest(regexp_extract_all(text, '\b\d{16}\b')) AS num
        |  FROM aug
        |), lu AS (
        |  SELECT doc_id, num,
        |    (sum(CASE WHEN i % 2 = 1
        |              THEN CASE WHEN d * 2 > 9 THEN d * 2 - 9 ELSE d * 2 END
        |              ELSE d END) % 10 = 0) AS ok
        |  FROM (
        |    SELECT doc_id, num, CAST(cs[i] AS INT) AS d, i
        |    FROM (SELECT doc_id, num, regexp_extract_all(num, '.') AS cs FROM cand),
        |         unnest(generate_series(1, 16)) AS u(i)
        |  ) GROUP BY doc_id, num
        |), agg AS (
        |  SELECT doc_id, CAST(count(*) AS INT) AS n_card_candidates,
        |    CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS INT) AS n_luhn_valid
        |  FROM lu GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  coalesce(a.n_card_candidates, 0) AS n_card_candidates,
        |  coalesce(a.n_luhn_valid, 0) AS n_luhn_valid
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "x35_pii_scan" ->
      s"""WITH aug AS (SELECT doc_id, $Aug AS text FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
         |  len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ipv4,
         |  len(regexp_extract_all(text, '\\b\\d{3}-\\d{4}-\\d{4}\\b')) AS n_phone,
         |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
         |    + len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
         |    + len(regexp_extract_all(text, '\\b\\d{3}-\\d{4}-\\d{4}\\b')) AS n_pii
         |FROM aug ORDER BY doc_id""".stripMargin,

    "x36_pii_redact" ->
      s"""WITH aug AS (SELECT doc_id, $Aug AS text FROM documents)
         |SELECT doc_id,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
         |    '\\b\\d{3}-\\d{4}-\\d{4}\\b', '<PHONE>', 'g')) AS redacted_md5
         |FROM aug ORDER BY doc_id""".stripMargin,

    "x39_html_extract" ->
      s"""WITH aug AS (
         |  SELECT doc_id,
         |    '<html><head><style>p{color:red}</style>' ||
         |    '<script>var x=1;</script></head><body><h1>Doc ' ||
         |    CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
         |    '</p><!-- hidden --> &amp; &lt;tail&gt;</body></html>' AS html
         |  FROM documents
         |)
         |SELECT doc_id, md5(trim(regexp_replace(
         |  replace(replace(replace(replace(replace(replace(
         |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |    regexp_replace(regexp_replace(html,
         |      '(?is)<script[^>]*>.*?</script\\s*>', ' ', 'g'),
         |      '(?is)<style[^>]*>.*?</style\\s*>', ' ', 'g'),
         |      '(?is)<script[^>]*>.*', ' ', 'g'),
         |      '(?is)<style[^>]*>.*', ' ', 'g'),
         |      '(?s)<!--.*?-->', ' ', 'g'),
         |      '(?s)<[a-zA-Z/!][^>]*>', ' ', 'g'),
         |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
         |    '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
         |  '\\s+', ' ', 'g'))) AS text_md5
         |FROM aug ORDER BY doc_id""".stripMargin,

    "x37_rare_token_ratio" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), x -> x != '')) AS tok
        |  FROM documents
        |),
        |pd AS (SELECT doc_id, tok, count(*) AS c_local FROM tok GROUP BY 1, 2),
        |freq AS (SELECT tok, sum(c_local) AS c FROM pd GROUP BY 1),
        |tot AS (SELECT sum(c) AS n, count(*) AS v FROM freq)
        |SELECT doc_id,
        |  round(CAST(sum(CASE WHEN CAST(c AS HUGEINT) * v < n THEN c_local ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(c_local) AS DOUBLE), 6) AS rare_ratio
        |FROM pd JOIN freq USING (tok), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
