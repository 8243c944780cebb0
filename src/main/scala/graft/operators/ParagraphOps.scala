package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Paragraph-level corpus hygiene: corpus-frequency paragraph dedup and
  * per-source boilerplate stripping — the FineWeb/C4-style passes that
  * run between document dedup and packing in a training-data pipeline.
  *
  * "Paragraphs" follow the engine's chunk convention
  * ([[PackingQueries.chunkOverlap]] with stride = width): the synthetic
  * corpus has no newlines, and a fixed token grid keeps the unit
  * oracle-expressible in both engines. Swap the chunker for a
  * newline/blank-line splitter on a real corpus — every downstream step
  * operates on (id, pid, chunk) rows and is splitter-agnostic.
  *
  * Scale shape: one corpus-wide groupBy on the 64-bit chunk hash (never
  * the chunk text) for the frequency side, one join back on the same
  * hash, one groupBy(id) to reassemble — all map-side-combinable, no
  * window over the whole corpus, no driver collect.
  */
object ParagraphOps {

  /** Non-overlapping paragraph grid (id, pid, chunk, h). Chunks are
    * built from RAW whitespace tokens — reassembled text keeps the
    * document's casing (lowercasing a training corpus would be
    * destructive) — while h, the 64-bit hash every shuffle in this
    * family keys on, is taken over the LOWERCASED chunk so frequency
    * counting is case-insensitive (the tokens() convention; the
    * all-lowercase oracle corpus makes the two views coincide). The
    * shingle-table convention applies: join/aggregate on 8 bytes, not
    * on a ~400-byte string; a 2^-64 collision merges two counts.
    */
  private def paragraphs(docs: DataFrame, idCol: String, textCol: String,
                         width: Int): DataFrame = {
    val rawTokens =
      filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")
    PackingQueries.chunkOverlapOf(docs, idCol, rawTokens, width, stride = width)
      .select(col(idCol), col("chunk_id").as("pid"), col("chunk"),
        xxhash64(lower(col("chunk"))).as("h"))
  }

  /** Corpus-frequency paragraph dedup (the FineWeb pass): drop every
    * paragraph that occurs in more than `maxDf` distinct documents,
    * reassemble the survivors in document order. Output one row per
    * input document: (id, clean_text, n_kept, n_dropped) — a document
    * whose every paragraph is corpus-duplicated survives with empty
    * text (the caller's min-length filter is a separate policy pass).
    */
  def paragraphDedup(docs: DataFrame, idCol: String, textCol: String,
                     width: Int, maxDf: Int): DataFrame = {
    require(width > 0 && maxDf >= 1, s"width=$width maxDf=$maxDf")
    val para = paragraphs(docs, idCol, textCol, width)
    val freq = para.groupBy(col("h"))
      .agg(count_distinct(col(idCol)).as("df"))
    val kept = para.join(freq.filter(col("df") <= maxDf).select("h"), Seq("h"))
    val tot = para.groupBy(col(idCol)).agg(count(lit(1)).as("tot"))
    val re = kept.groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pid"), col("chunk")))),
          s => s("chunk")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol))
      .join(tot, Seq(idCol), "left")
      .join(re, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("tot"), lit(0L)) - coalesce(col("n_kept"), lit(0L)))
          .as("n_dropped"))
  }

  /** Per-source boilerplate stripping: a paragraph present in at least
    * `minFrac` of a source's documents (site header/footer, nav chrome)
    * is boilerplate FOR THAT SOURCE and removed from each of them.
    * The boundary test nd/ns >= minFrac runs as the integer comparison
    * nd * 1e6 >= round(minFrac * 1e6) * ns — minFrac is a 6-decimal
    * policy knob and the oracle writes the SAME integer form, so there
    * is no cross-engine float-division seam at the threshold.
    * NULL sources form their own bucket (a sentinel imputes the group
    * key) — the bucket then behaves like any other: its documents keep
    * what is rare WITHIN the unattributed set rather than being
    * silently hollowed out by a never-matching null equi-join.
    */
  def boilerplateStrip(docs: DataFrame, idCol: String, textCol: String,
                       srcCol: String, width: Int, minFrac: Double): DataFrame = {
    require(width > 0 && minFrac > 0 && minFrac <= 1,
      s"width=$width minFrac=$minFrac")
    val fracPpm = math.round(minFrac * 1e6)
    val srcKey = coalesce(col(srcCol).cast("string"), lit("\u0000"))
    val para = paragraphs(docs, idCol, textCol, width)
      .join(docs.select(col(idCol), srcKey.as("__src")), Seq(idCol))
    val srcN = docs.groupBy(srcKey.as("__src")).agg(count(lit(1)).as("ns"))
    val freq = para.groupBy(col("__src"), col("h"))
      .agg(count_distinct(col(idCol)).as("nd"))
      .join(srcN, Seq("__src"))
    val keepKeys = freq
      .filter(col("nd") * lit(1000000L) < lit(fracPpm) * col("ns"))
      .select(col("__src"), col("h"))
    val kept = para.join(keepKeys, Seq("__src", "h"))
    val tot = para.groupBy(col(idCol)).agg(count(lit(1)).as("tot"))
    val re = kept.groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pid"), col("chunk")))),
          s => s("chunk")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol))
      .join(tot, Seq(idCol), "left")
      .join(re, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("tot"), lit(0L)) - coalesce(col("n_kept"), lit(0L)))
          .as("n_dropped"))
  }
}
