package graft.interleave

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** J1/J2/J3 — source interleaving and splitting.
  *
  * The reference builds per-source page dicts and iterates the sorted union
  * of page numbers, emitting each source's section (or a
  * `[Page not found in X extraction]` placeholder) in a fixed source order
  * (combine_extractions.py:144-192; 3-way cert_extract_pla.py:453-560).
  * In Spark that is a full-outer join on (doc, page) + coalesce placeholders,
  * with output order (page asc, source-rank asc).
  */
object Interleave {

  val spanType: DataType = ArrayType(StructType(Seq(
    StructField("kind", StringType),
    StructField("text", StringType),
    StructField("media_ref", StringType),
    StructField("offset", IntegerType))), containsNull = false)

  /** Typed empty `spans` array (for docs with no surviving pages). */
  def emptySpans: Column = filter(
    array(struct(lit("").as("kind"), lit("").as("text"),
      lit("").as("media_ref"), lit(0).as("offset"))),
    _ => lit(false))

  def placeholder(kind: String): Column =
    lit(s"[Page not found in $kind extraction]")

  /** J1/J2 — N-way page interleave. Each input: (doc_id, page, text) for one
    * named source kind, given in the required output source order (the Seq
    * order IS the kind-rank contract — e.g. the reference's 3-way order
    * pdfplumber ≺ PyMuPDF ≺ Tesseract, llm_pla.py:50-63). Result: one row
    * per (doc_id, page, kind) over the union of pages of all sources, with
    * placeholders where a source misses the page; `source_rank` carries the
    * order so consumers can sort per-doc.
    *
    * `globalSort` adds a cluster-wide (doc_id, page, source_rank) sort — a
    * full range-partition shuffle that exists only for presentation. It is
    * opt-in: corpus-scale pipelines should leave it off and order per doc
    * downstream (EP1 does this with a per-doc array_sort).
    */
  def interleave(sources: Seq[(String, DataFrame)],
      globalSort: Boolean = false): DataFrame = {
    val renamed = sources.zipWithIndex.map { case ((kind, df), i) =>
      (kind, i, df.select(col("doc_id"), col("page"), col("text").as(s"text_$i")))
    }
    val joined = renamed.map(_._3).reduce((a, b) => a.join(b, Seq("doc_id", "page"), "full_outer"))
    val perSource = renamed.map { case (kind, i, _) =>
      joined.select(
        col("doc_id"), col("page"),
        lit(kind).as("kind"),
        lit(i).as("source_rank"),
        coalesce(col(s"text_$i"), placeholder(kind)).as("text"))
    }
    val unioned = perSource.reduce(_ unionByName _)
    if (globalSort) unioned.orderBy(col("doc_id"), col("page"), col("source_rank"))
    else unioned
  }

  /** J3 — combined-doc → per-source split: in the span model this is just a
    * kind filter (the inverse string-split of llm_pl.py:35-65 disappears).
    */
  def split(spans: DataFrame, kind: String): DataFrame =
    spans.filter(col("kind") === kind)

  /** Serialize interleaved span rows `(doc_id, kind, text, media_ref,
    * offset)` to the multimodal training format: text spans verbatim,
    * media spans as markdown image placeholders `![](media_ref)`, blocks
    * joined by blank lines in offset order — the MMC4-style document a
    * text+image pretraining corpus actually stores (the media bytes live
    * in the object store; the placeholder carries the reference, and the
    * INTERLEAVING POSITION is the training signal being preserved).
    *
    * Plan: ONE partial-agg groupBy on doc_id; per-doc array state is one
    * document (bounded by doc length, the same state every per-doc kernel
    * here holds). Null text renders as an empty block. */
  def toMarkdown(spans: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val block = (x: Column) =>
      when(x.getField("kind") === "media",
        concat(lit("![]("), coalesce(x.getField("media_ref"), lit("")),
          lit(")")))
        .otherwise(coalesce(x.getField("text"), lit("")))
    spans.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("offset"), col("kind"),
        col("text"), col("media_ref")))).as("__sp"))
      .select(col(idCol),
        array_join(transform(col("__sp"), block), "\n\n").as("md"),
        size(col("__sp")).cast("long").as("n_spans"))
  }

  /** Inverse of [[toMarkdown]]: parse MMC4-style documents back to span
    * rows `(idCol, kind, text, media_ref, offset)` — the ingest side when
    * the corpus arrives already serialized. Blocks split on blank lines;
    * a block that is exactly `![](ref)` becomes a media span (empty ref →
    * null), everything else a text span. Offsets are the DENSE block
    * positions — the original sparse offsets are not stored by the
    * serialization, and only the order is the training signal. Inherent
    * contract of the format (not this parser): a text block that is
    * literally an image placeholder round-trips as media, and text
    * containing blank lines re-splits into multiple blocks. Narrow
    * posexplode, zero shuffles. */
  def fromMarkdown(docs: DataFrame, idCol: String, mdCol: String)
      : DataFrame = {
    val mediaRe = "^!\\[\\]\\(([^)]*)\\)$"
    val isMedia = col("block").rlike(mediaRe)
    // NB: functions.split is shadowed by this object's J3 split(df, kind)
    docs.select(col(idCol),
      posexplode(org.apache.spark.sql.functions.split(col(mdCol), "\n\n"))
        .as(Seq("pos", "block")))
      .select(col(idCol),
        when(isMedia, "media").otherwise("text").as("kind"),
        when(isMedia, lit(null).cast("string")).otherwise(col("block"))
          .as("text"),
        when(isMedia, nullif(regexp_extract(col("block"), mediaRe, 1),
          lit(""))).otherwise(lit(null).cast("string")).as("media_ref"),
        col("pos").cast("int").as("offset"))
  }

  /** Caption-candidate alignment: each media span paired with its NEAREST
    * text span by offset distance (ties → the preceding one — captions
    * usually precede or sit beside their figure). The deterministic stand-in
    * for CLIP-score image-text alignment in a multimodal curation pipeline:
    * the candidate extraction is this; the scorer swaps in later.
    *
    * Output: (idCol, offset, media_ref, caption_offset, caption) — one row
    * per media span; both null when the doc has no text span. Plan: ONE
    * per-doc window (hash exchange on the doc key + in-partition sort),
    * running last/first-ignore-nulls — no self-join, no per-doc state
    * beyond the window frame. */
  def nearestCaption(spans: DataFrame, idCol: String = "doc_id")
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // full tie-break (offset, text, media_ref): with duplicate offsets a
    // bare ORDER BY offset leaves last/first frame contents row-order
    // dependent — nondeterministic across runs and engines
    val w = Window.partitionBy(col(idCol)).orderBy(col("offset"),
      coalesce(col("text"), lit("")), coalesce(col("media_ref"), lit("")))
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val after = w.rowsBetween(1, Window.unboundedFollowing)
    val textOff = when(col("kind") === "text", col("offset"))
    val textVal = when(col("kind") === "text", col("text"))
    val prevOff = last(textOff, ignoreNulls = true).over(before)
    val prevTxt = last(textVal, ignoreNulls = true).over(before)
    val nextOff = first(textOff, ignoreNulls = true).over(after)
    val nextTxt = first(textVal, ignoreNulls = true).over(after)
    // the preference must read the MATERIALIZED columns: a window
    // expression evaluated after the media filter would only see media rows
    val preferPrev = col("__no").isNull || (col("__po").isNotNull &&
      (col("offset") - col("__po")) <= (col("__no") - col("offset")))
    spans
      .withColumn("__po", prevOff).withColumn("__pt", prevTxt)
      .withColumn("__no", nextOff).withColumn("__nt", nextTxt)
      .filter(col("kind") === "media")
      .select(col(idCol), col("offset"), col("media_ref"),
        when(preferPrev, col("__po")).otherwise(col("__no"))
          .cast("int").as("caption_offset"),
        when(preferPrev, col("__pt")).otherwise(col("__nt")).as("caption"))
  }
}
