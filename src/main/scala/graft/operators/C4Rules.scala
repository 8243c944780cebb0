package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** C4 line-level cleaning rules (Raffel et al. 2020, §2.2 "C4") — the
  * per-line half of the C4 recipe the document-level gates (x49 Gopher,
  * x106 repetition) do not cover: drop lines that do not end in
  * terminal punctuation, lines with fewer than `MinWords` words, lines
  * containing "lorem ipsum" placeholder text, and lines containing "{"
  * (the curly-brace Javascript marker), then reassemble each document
  * from its surviving lines.
  *
  * "Lines" follow the engine's chunk-grid convention (ParagraphOps:
  * the synthetic corpus has no newlines, a fixed token grid keeps the
  * unit oracle-expressible; swap the chunker for a newline splitter on
  * a real corpus — every rule below is splitter-agnostic).
  *
  * Scale shape: the line explode is scan-side (one generator, no
  * shuffle), the per-line rules are pure string predicates, and the
  * per-doc reassembly is ONE groupBy(id) with map-side combine —
  * exactly the x40 paragraph-dedup shape minus its corpus-frequency
  * join, so it scales wherever x40 does.
  *
  * Cross-engine surface: every rule is observable — the word-count rule
  * fires naturally on each document's short tail chunk; terminal
  * punctuation, lorem-ipsum and curly braces do not occur in the
  * word-salad corpus, so deterministic phrases ride doc_id % {7, 11,
  * 13} docs (the x44/x49 planting convention), mirrored as literals in
  * the oracle.
  *
  * Reference analog: none — the reference cleans tabular cells
  * (pd_data_cleaner.py), not prose; SURVEY §7.4 curation extension.
  */
object C4Rules {
  type Q = (SparkSession, String) => DataFrame

  val Width = 8
  val MinWords = 5

  /** Per-document C4 line accounting + cleaned text over lines of
    * `width` tokens: per-rule line counts and the reassembly of lines
    * passing ALL rules. Documents whose every line drops survive with
    * empty text (policy-pass convention, same as x40).
    */
  def c4LineClean(docs: DataFrame, idCol: String, textCol: String,
                  width: Int = Width, minWords: Int = MinWords): DataFrame = {
    val rawTokens =
      filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")
    val lines = PackingQueries.chunkOverlapOf(docs, idCol, rawTokens,
        width, stride = width)
      .select(col(idCol), col("chunk_id").as("pid"), col("chunk"))
    val nw = size(split(col("chunk"), " "))
    val flagged = lines.select(col(idCol), col("pid"), col("chunk"),
      (nw < minWords).as("r_short"),
      col("chunk").rlike("[.!?]$").as("r_punct"),
      col("chunk").contains("lorem ipsum").as("r_lorem"),
      col("chunk").contains("{").as("r_brace"))
    val keep = !col("r_short") && col("r_punct") &&
      !col("r_lorem") && !col("r_brace")
    val stats = flagged.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_lines"),
      sum(col("r_punct").cast("long")).as("n_punct_lines"),
      sum(col("r_short").cast("long")).as("n_short_lines"),
      sum(col("r_lorem").cast("long")).as("n_lorem_lines"),
      sum(col("r_brace").cast("long")).as("n_brace_lines"))
    val re = flagged.filter(keep).groupBy(col(idCol)).agg(
      array_join(transform(
        array_sort(collect_list(struct(col("pid"), col("chunk")))),
        s => s("chunk")), " ").as("clean_text"),
      count(lit(1)).as("n_kept"))
    docs.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .join(re, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_punct_lines"), lit(0L)).as("n_punct_lines"),
        coalesce(col("n_short_lines"), lit(0L)).as("n_short_lines"),
        coalesce(col("n_lorem_lines"), lit(0L)).as("n_lorem_lines"),
        coalesce(col("n_brace_lines"), lit(0L)).as("n_brace_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  // planted phrases (lowercase — the oracle corpus convention); applied
  // in this order on both engines. The punctuation plant goes LAST so a
  // doc carrying several plants still ENDS with the terminal '.' (the
  // other two rules are contains-anywhere and don't care where they
  // land).
  // three "lorem ipsum" repetitions: the phrase is a TWO-token
  // contains-check and the chunk grid can split any single pair — an
  // 8-token suffix crosses at most one chunk boundary, and one split
  // cannot break all three pairs, so some line always carries the
  // intact phrase wherever the plant lands
  private val LoremPlant = " lorem ipsum lorem ipsum lorem ipsum dolor sit"
  private val BracePlant = " function demo { return zero }"
  private val PunctPlant = " the final sentence ends correctly here."

  private def plantedInput: Column =
    concat(col("text"),
      when(col("doc_id") % 11 === 0, lit(LoremPlant)).otherwise(lit("")),
      when(col("doc_id") % 13 === 0, lit(BracePlant)).otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit(PunctPlant)).otherwise(lit("")))

  val queries: Map[String, Q] = Map(
    "x109_c4_line_rules" -> ((s, d) =>
      c4LineClean(
        Tables(s, d, "documents").select(col("doc_id"), plantedInput.as("t")),
        "doc_id", "t")
        .orderBy(col("doc_id")))
  )

  val oracleSql: Map[String, String] = Map(
    "x109_c4_line_rules" ->
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    text
         |    || CASE WHEN doc_id % 11 = 0 THEN '$LoremPlant' ELSE '' END
         |    || CASE WHEN doc_id % 13 = 0 THEN '$BracePlant' ELSE '' END
         |    || CASE WHEN doc_id % 7 = 0 THEN '$PunctPlant' ELSE '' END AS t
         |  FROM documents
         |), tok AS (
         |  SELECT doc_id, list_filter(string_split_regex(trim(t), '\\s+'), x -> x <> '') AS ts
         |  FROM docs
         |), para AS (
         |  SELECT doc_id, CAST(st // $Width AS INT) AS pid,
         |    array_to_string(ts[st + 1 : st + $Width], ' ') AS chunk
         |  FROM tok, unnest(generate_series(0, greatest(len(ts) - 1, 0), $Width)) AS u(st)
         |  WHERE len(ts) > 0
         |), flagged AS (
         |  SELECT doc_id, pid, chunk,
         |    len(string_split(chunk, ' ')) < $MinWords AS r_short,
         |    regexp_matches(chunk, '[.!?]$$') AS r_punct,
         |    contains(chunk, 'lorem ipsum') AS r_lorem,
         |    contains(chunk, '{') AS r_brace
         |  FROM para
         |), stats AS (
         |  SELECT doc_id, count(*) AS n_lines,
         |    sum(CASE WHEN r_punct THEN 1 ELSE 0 END) AS n_punct_lines,
         |    sum(CASE WHEN r_short THEN 1 ELSE 0 END) AS n_short_lines,
         |    sum(CASE WHEN r_lorem THEN 1 ELSE 0 END) AS n_lorem_lines,
         |    sum(CASE WHEN r_brace THEN 1 ELSE 0 END) AS n_brace_lines
         |  FROM flagged GROUP BY doc_id
         |), re AS (
         |  SELECT doc_id, string_agg(chunk, ' ' ORDER BY pid) AS clean_text,
         |    count(*) AS n_kept
         |  FROM flagged
         |  WHERE NOT r_short AND r_punct AND NOT r_lorem AND NOT r_brace
         |  GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |  CAST(coalesce(s.n_lines, 0) AS BIGINT) AS n_lines,
         |  CAST(coalesce(s.n_punct_lines, 0) AS BIGINT) AS n_punct_lines,
         |  CAST(coalesce(s.n_short_lines, 0) AS BIGINT) AS n_short_lines,
         |  CAST(coalesce(s.n_lorem_lines, 0) AS BIGINT) AS n_lorem_lines,
         |  CAST(coalesce(s.n_brace_lines, 0) AS BIGINT) AS n_brace_lines,
         |  CAST(coalesce(re.n_kept, 0) AS BIGINT) AS n_kept,
         |  coalesce(re.clean_text, '') AS clean_text
         |FROM docs d
         |LEFT JOIN stats s ON d.doc_id = s.doc_id
         |LEFT JOIN re ON d.doc_id = re.doc_id
         |ORDER BY d.doc_id""".stripMargin
  )
}
