package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Mojibake detection + repair \u2014 the encoding-hygiene pass a web-scale
  * corpus runs before any text analysis: detect UTF-8 byte sequences
  * that were mis-decoded as Latin-1 ("\u00c3\u00a9" where "\u00e9" was meant, "\u00e2\u20ac\u00a6"
  * for an ellipsis) and repair them by reversing the mis-decode
  * (re-encode the characters as Latin-1 bytes, decode those bytes as
  * UTF-8). The ftfy "decode-encode roundtrip" core, expressed as pure
  * Catalyst expressions.
  *
  * Detection is STRICT: `moji_score` counts maximal character groups
  * that spell a valid UTF-8 multi-byte sequence when each char in
  * U+0080\u2013U+00FF is read as its byte value (the full RFC 3629 grammar \u2014
  * overlongs and surrogate ranges excluded), and repair additionally
  * requires the WHOLE string to parse as UTF-8 bytes that way
  * (`\A(ascii|group)*\z`). The guard makes the repair decode total: a
  * string that full-matches can never throw MALFORMED_CHARACTER_CODING,
  * so no permissive/replacement decode mode is ever needed, and a
  * string with stray high bytes (real Latin-1 text, binary junk) is
  * left untouched rather than half-repaired.
  *
  * Scale shape: scan-side only \u2014 two regexp counts, one rlike, and a
  * conditional encode\u2192decode, all codegen'd string expressions; zero
  * shuffle, zero state at any corpus size.
  *
  * Cross-engine surface: the corpus is ASCII (the x44 convention), so
  * the declared query plants a deterministic non-ASCII phrase on
  * doc_id % 13 docs and corrupts it HONESTLY engine-side
  * (decode(encode(phrase, UTF-8), ISO-8859-1) \u2014 constant-folded); the
  * DuckDB oracle mirrors the corrupted input as a chr()-built literal,
  * computes the detection columns with the SAME regexes (RE2 and Java
  * both take the `\x{HH}` class syntax), and models the repair as the
  * planted-phrase restoration the roundtrip guarantees.
  *
  * Reference analog: none \u2014 no encoding hygiene in the reference
  * (pd_data_cleaner.py normalizes whitespace/case only); SURVEY \u00a77.4
  * text-analysis extension mandate.
  */
object EncodingRepair {
  type Q = (SparkSession, String) => DataFrame

  /** Planted original: 2-byte (\u00e9 U+00E9, \u00ef U+00EF, \u00df U+00DF) and
    * 3-byte (\u2014 U+2014) UTF-8 sequences, so both group widths and the
    * C1-control symptom (0x80/0x94 continuation bytes) are exercised.
    */
  val plantedPhrase = " caf\u00e9 \u2014 na\u00efve stra\u00dfe"

  /** The mojibake of `s`: its UTF-8 bytes re-read as Latin-1 chars.
    * Total for any input (Latin-1 decodes every byte), and invertible
    * by the repair direction whenever the result full-matches the
    * UTF-8 grammar below.
    */
  def mojibake(s: String): String =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)

  // Strict UTF-8 multi-byte grammar over byte-valued chars (RFC 3629):
  // 2-byte C2\u2013DF + 1 continuation; 3-byte excludes overlongs (E0 needs
  // A0\u2013BF) and surrogates (ED capped at 9F); 4-byte excludes overlongs
  // (F0 needs 90+) and >U+10FFFF (F4 capped at 8F). Shared verbatim by
  // Java (Spark) and RE2 (DuckDB).
  private val cont = "[\\x{80}-\\x{BF}]"
  val groupRe: String =
    s"(?:[\\x{C2}-\\x{DF}]$cont" +
      s"|(?:\\x{E0}[\\x{A0}-\\x{BF}]|[\\x{E1}-\\x{EC}\\x{EE}\\x{EF}]$cont|\\x{ED}[\\x{80}-\\x{9F}])$cont" +
      s"|(?:\\x{F0}[\\x{90}-\\x{BF}]|[\\x{F1}-\\x{F3}]$cont|\\x{F4}[\\x{80}-\\x{8F}])$cont$cont)"
  val fullRe: String = s"\\A(?:[\\x{00}-\\x{7F}]|$groupRe)*\\z"
  private[graft] val c1Re = "[\\x{80}-\\x{9F}]"

  /** Count of valid mojibake groups (non-overlapping, leftmost). */
  def mojiScore(c: Column): Column =
    size(regexp_extract_all(c, lit(groupRe), lit(0)))

  /** Count of C1-control chars \u2014 the classic mojibake symptom (no
    * legitimate text contains U+0080\u2013U+009F); informational column.
    */
  def c1Count(c: Column): Column =
    size(regexp_extract_all(c, lit(c1Re), lit(0)))

  /** True iff the whole string parses as UTF-8 bytes (chars as byte
    * values) \u2014 the totality guard for [[repair]].
    */
  def repairable(c: Column): Column = c.rlike(fullRe)

  /** The repair direction: chars \u2192 Latin-1 bytes \u2192 UTF-8 decode. Only
    * total when [[repairable]] holds (callers must guard).
    */
  def repair(c: Column): Column = decode(encode(c, "ISO-8859-1"), "UTF-8")

  /** Repair decision: at least one valid group AND the whole string
    * parses. Tamper hooks (spec-only) prove each gate clause fires:
    * `detectAlways` drops the score term, `guardOff` the full-parse
    * term.
    */
  private[graft] def mojiFlag(c: Column, detectAlways: Boolean = false,
                                  guardOff: Boolean = false): Column = {
    val scoreOk = if (detectAlways) lit(true) else mojiScore(c) >= 1
    val guard = if (guardOff) lit(true) else repairable(c)
    scoreOk && guard
  }

  /** Guarded repair: the input unchanged unless [[mojiFlag]] holds. */
  private[graft] def fixedText(c: Column, detectAlways: Boolean = false,
                                   guardOff: Boolean = false): Column =
    when(mojiFlag(c, detectAlways, guardOff), repair(c)).otherwise(c)

  /** Honest engine-side corruption of the planted phrase (a constant-
    * folded literal after the first fold).
    */
  private def corruptLit: Column =
    decode(encode(lit(plantedPhrase), "UTF-8"), "ISO-8859-1")

  /** x107g measurement as violation rows (empty = contracts hold).
    *   - roundtrip: corrupt-then-repair restores the original on EVERY
    *     doc (not just the declared query's %13 plant);
    *   - clean: ASCII text is never flagged or altered;
    *   - guard: a string with one valid group but stray invalid high
    *     bytes is REFUSED (is_moji false) \u2014 the half-mojibake case a
    *     permissive repairer would corrupt.
    * The tamper flags (spec hooks) each make exactly one clause fire:
    * `doubleCorrupt` breaks roundtrip, `detectAlways` breaks clean,
    * `guardOff` breaks guard.
    */
  private[graft] def gateViolations(s: SparkSession, d: String,
                                    doubleCorrupt: Boolean = false,
                                    detectAlways: Boolean = false,
                                    guardOff: Boolean = false): DataFrame = {
    val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
    val corrupt =
      if (doubleCorrupt) lit(mojibake(mojibake(plantedPhrase))) else corruptLit
    val inp = concat(col("text"), corrupt)
    val orig = concat(col("text"), lit(plantedPhrase))
    val roundtrip = docs
      .select(col("doc_id"), inp.as("s"), orig.as("orig"))
      .withColumn("fixed", fixedText(col("s"), detectAlways, guardOff))
      .filter(!mojiFlag(col("s"), detectAlways, guardOff) ||
        col("fixed") =!= col("orig"))
      .select(col("doc_id"), lit("roundtrip").as("clause"))
    val clean = docs
      .select(col("doc_id"), col("text").as("s"))
      .filter(mojiFlag(col("s"), detectAlways, guardOff) ||
        fixedText(col("s"), detectAlways, guardOff) =!= col("s"))
      .select(col("doc_id"), lit("clean").as("clause"))
    // one valid group (the \u00e9 mojibake) + a lone lead byte that can
    // never be a UTF-8 sequence: the repair decision must be NO. Only
    // the decision is read \u2014 fixedText is never evaluated here, so the
    // guardOff tamper cannot throw, it can only (correctly) fire.
    val poisoned = concat(col("text"), lit(mojibake("\u00e9")), lit("\u00c3!"))
    val guardClause = docs
      .select(col("doc_id"), poisoned.as("s"))
      .filter(mojiFlag(col("s"), detectAlways, guardOff))
      .select(col("doc_id"), lit("guard").as("clause"))
    roundtrip.union(clean).union(guardClause)
      .orderBy(col("clause"), col("doc_id"))
  }

  /** A DuckDB expression evaluating to `s`: printable-ASCII runs as
    * quoted literals, everything else as chr(codepoint).
    */
  private def sqlLit(s: String): String = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    val run = new StringBuilder
    def flush(): Unit = if (run.nonEmpty) {
      parts += "'" + run.toString.replace("'", "''") + "'"; run.clear()
    }
    s.foreach { ch =>
      if (ch >= 0x20 && ch <= 0x7e) run.append(ch)
      else { flush(); parts += s"chr(${ch.toInt})" }
    }
    flush()
    if (parts.isEmpty) "''" else parts.mkString(" || ")
  }

  val queries: Map[String, Q] = Map(
    // detection + guarded repair over the corpus with the planted
    // corruption on doc_id % 13 docs (clean docs must pass through
    // untouched with score 0)
    "x107_mojibake_repair" -> ((s, d) => {
      val inp = Tables(s, d, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 13 === 0, corruptLit).otherwise(lit("")))
          .as("s"))
      inp.select(col("doc_id"),
          mojiScore(col("s")).as("moji_score"),
          c1Count(col("s")).as("n_c1"),
          mojiFlag(col("s")).as("is_moji"),
          length(col("s")).as("n_in"),
          fixedText(col("s")).as("fixed_text"))
        .withColumn("n_fixed", length(col("fixed_text")))
        .orderBy(col("doc_id"))
    }),

    // Gate (empty-set oracle): corrupt\u2192repair roundtrip on every doc,
    // clean-text passthrough, and refusal on stray invalid high bytes.
    "x107g_mojibake_gate" -> ((s, d) => gateViolations(s, d))
  )

  val oracleSql: Map[String, String] = Map(
    "x107_mojibake_repair" -> {
      val corrupt = sqlLit(mojibake(plantedPhrase))
      val orig = sqlLit(plantedPhrase)
      s"""WITH inp AS (
         |  SELECT doc_id, text,
         |    text || CASE WHEN doc_id % 13 = 0 THEN $corrupt ELSE '' END AS s
         |  FROM documents
         |), det AS (
         |  SELECT doc_id, text, s,
         |    len(regexp_extract_all(s, '$groupRe')) AS ng,
         |    regexp_matches(s, '$fullRe') AS ok
         |  FROM inp
         |)
         |SELECT doc_id,
         |  CAST(ng AS INT) AS moji_score,
         |  CAST(len(regexp_extract_all(s, '$c1Re')) AS INT) AS n_c1,
         |  (ng >= 1 AND ok) AS is_moji,
         |  CAST(length(s) AS INT) AS n_in,
         |  CASE WHEN ng >= 1 AND ok THEN text || $orig ELSE s END AS fixed_text,
         |  CAST(length(CASE WHEN ng >= 1 AND ok THEN text || $orig ELSE s END) AS INT) AS n_fixed
         |FROM det ORDER BY doc_id""".stripMargin
    },

    "x107g_mojibake_gate" ->
      """SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS VARCHAR) AS clause
        |WHERE false""".stripMargin
  )
}
