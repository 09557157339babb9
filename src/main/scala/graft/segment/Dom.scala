package graft.segment

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Batched per-partition DOM tokenization — the north-star stage that turns
  * raw HTML into ordered text-node rows an extraction pipeline can score
  * (BASELINE.json north_star: "batched per-partition DOM tokenization and
  * boilerplate classification ... à la Boilerpipe/Readability").
  *
  * [[textNodes]] is a single-pass, stack-based tokenizer — no DOM library,
  * no backtracking, O(doc length):
  *  - open/close/self-closing tags with quoted attributes (a `>` inside a
  *    quoted attribute value does NOT end the tag);
  *  - HTML void elements (`br`, `img`, `meta`, ...) never push;
  *  - raw-text elements (`script`, `style`) are skipped wholesale — their
  *    bodies are code, not content, and may contain `<`;
  *  - comments (`<!-- -->`) and directives (`<!doctype>`, `<? ?>`) skipped;
  *  - lenient recovery: a close tag with no matching open is ignored; a
  *    close tag pops every deeper unclosed element (how browsers recover);
  *    an open tag whose kind is on top of the stack and cannot self-nest
  *    (`p`, `li`, `tr`, `td`, `th`, `option`) implies a sibling close first
  *    (the HTML5 "implied end tag" everyone actually relies on).
  * Every rule is deterministic, so an independent engine that knows the
  * template of a synthesized document can replay the node list without
  * parsing — which is exactly how the `dom_nodes` oracle checks this.
  *
  * Each emitted node carries its ancestor `path` ("html/body/div/p"),
  * `depth`, whether it sits inside an `<a>` (anchor text is Boilerpipe's
  * strongest boilerplate signal), the whitespace-collapsed text, and word
  * counts. [[nodesDf]] runs the tokenizer as a typed `mapPartitions` —
  * completely NARROW, zero shuffles at any corpus size, per-doc bounded
  * memory. [[mainContent]] then picks each document's main container à la
  * Readability: group nodes by parent path, score words-minus-penalized-
  * link-words, keep the argmax container's nodes — one partial-aggregated
  * groupBy plus one per-doc window, nothing global.
  */
object Dom {

  /** Elements that never take a closing tag (HTML void elements). */
  val VoidTags: Set[String] = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")

  /** Raw-text elements whose bodies are skipped (may contain bare `<`). */
  val RawTextTags: Set[String] = Set("script", "style")

  /** Elements that cannot nest directly inside themselves: an open with an
    * identical top-of-stack implies a sibling close (HTML5 implied end). */
  val NoSelfNest: Set[String] = Set("p", "li", "tr", "td", "th", "option")

  /** Penalty multiplier for anchor words in [[mainContent]] scoring. */
  val LinkWordPenalty = 3L

  final case class Node(idx: Int, path: String, depth: Int,
      inAnchor: Boolean, text: String, nWords: Int, nLinkWords: Int)

  // --------------------------------------------------------- tokenizer ----

  private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def isNameChar(c: Char): Boolean =
    isNameStart(c) || (c >= '0' && c <= '9') || c == '-'

  private def collapse(s: String): String =
    s.replaceAll("\\s+", " ").replaceAll("^ | $", "")

  private def words(s: String): Int =
    if (s.isEmpty) 0 else s.split(" ").count(_.nonEmpty)

  /** Scan an open/close tag body starting at the tag-name end; returns
    * (indexAfterGt, selfClosing) honoring quoted attribute values (a `>`
    * inside a quoted attribute value does NOT end the tag). Shared by
    * [[textNodes]] and [[tableCells]] so both walkers see identical tag
    * boundaries. */
  private def scanTagEnd(html: String, from: Int): (Int, Boolean) = {
    val n = html.length
    var i = from
    var self = false
    while (i < n && html(i) != '>') {
      val c = html(i)
      if (c == '"' || c == '\'') {
        i += 1
        while (i < n && html(i) != c) i += 1
        if (i < n) i += 1
      } else {
        self = c == '/'
        i += 1
      }
    }
    (if (i < n) i + 1 else n, self)
  }

  /** Skip a raw-text element body (`script`/`style`) starting at `from`
    * (just after the open tag's `>`); returns the index after the matching
    * case-insensitive close tag's `>`. HTML5: the close-tag name must be
    * followed by whitespace, '/', '>' or EOF — "</scripty>" must NOT end a
    * <script> body. Shared by both walkers. */
  private def skipRawText(html: String, name: String, from: Int): Int = {
    val n = html.length
    val close = "</" + name
    var k = from
    var found = -1
    while (found < 0 && k + close.length <= n) {
      val boundaryOk = {
        val after = k + close.length
        after >= n || {
          val ch = html(after)
          ch == '>' || ch == '/' || Character.isWhitespace(ch)
        }
      }
      if (boundaryOk &&
        html.regionMatches(true, k, close, 0, close.length)) found = k
      else k += 1
    }
    if (found < 0) n
    else {
      val e = html.indexOf('>', found)
      if (e < 0) n else e + 1
    }
  }

  /** All text nodes of `html` in document order. Single pass, lenient. */
  def textNodes(html: String): Vector[Node] = {
    val n = html.length
    val stack = ArrayBuffer.empty[String]
    val out = Vector.newBuilder[Node]
    var idx = 0
    val buf = new StringBuilder

    def flush(): Unit = {
      val t = collapse(buf.toString)
      buf.clear()
      if (t.nonEmpty) {
        val w = words(t)
        val anchor = stack.contains("a")
        out += Node(idx, stack.mkString("/"), stack.length, anchor, t, w,
          if (anchor) w else 0)
        idx += 1
      }
    }

    var i = 0
    while (i < n) {
      val c = html(i)
      if (c != '<' || i + 1 >= n) { buf.append(c); i += 1 }
      else {
        val c1 = html(i + 1)
        if (c1 == '!') {
          flush()
          if (html.startsWith("<!--", i)) {
            val e = html.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3
          } else {
            val e = html.indexOf('>', i + 2)
            i = if (e < 0) n else e + 1
          }
        } else if (c1 == '?') {
          flush()
          val e = html.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else if (c1 == '/') {
          flush()
          var j = i + 2
          val s = j
          while (j < n && isNameChar(html(j))) j += 1
          val name = html.substring(s, j).toLowerCase
          val e = html.indexOf('>', j)
          i = if (e < 0) n else e + 1
          val at = stack.lastIndexOf(name)
          if (at >= 0) stack.remove(at, stack.length - at)
        } else if (isNameStart(c1)) {
          flush()
          var j = i + 1
          while (j < n && isNameChar(html(j))) j += 1
          val name = html.substring(i + 1, j).toLowerCase
          val (after, self) = scanTagEnd(html, j)
          i = after
          if (RawTextTags.contains(name) && !self) {
            i = skipRawText(html, name, i)
          } else if (!self && !VoidTags.contains(name)) {
            if (NoSelfNest.contains(name) && stack.nonEmpty &&
              stack.last == name) stack.remove(stack.length - 1)
            stack += name
          }
        } else { buf.append(c); i += 1 }
      }
    }
    flush()
    out.result()
  }

  // --------------------------------------------------------- DataFrame ----

  val NodeSchema: StructType = StructType(Seq(
    StructField("doc", StringType, nullable = true),
    StructField("node_idx", LongType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("depth", LongType, nullable = false),
    StructField("in_anchor", BooleanType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_words", LongType, nullable = false),
    StructField("n_link_words", LongType, nullable = false)))

  /** One row per text node: (idCol, node_idx, path, depth, in_anchor, text,
    * n_words, n_link_words). Typed mapPartitions over (id, html) — narrow,
    * zero shuffles; null/empty html yields no rows. */
  def nodesDf(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("string").as("doc"),
      col(htmlCol).as("__html"))
    src.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getString(0)
        val html = if (r.isNullAt(1)) "" else r.getString(1)
        textNodes(html).iterator.map(nd =>
          Row(id, nd.idx.toLong, nd.path, nd.depth.toLong, nd.inAnchor,
            nd.text, nd.nWords.toLong, nd.nLinkWords.toLong))
      }
    }(Encoders.row(NodeSchema)).withColumnRenamed("doc", idCol)
  }

  /** The north-star interleaved-span strip: over exploded span rows
    * `(doc_id, kind, text, media_ref, offset)`, tokenize each NON-media
    * span's text as HTML and replace it with the space-joined text of its
    * non-anchor nodes (anchor text is boilerplate — nav, footers, related
    * links); spans whose content is all-anchor or empty are dropped.
    * `media` spans pass through untouched — the "media-span passthrough
    * that preserves interleaving order via a stable sort on offset within
    * doc_id" (BASELINE.json north_star): every surviving span keeps its
    * original `offset`, so the consumer's `(doc_id, offset)` sort restores
    * the exact interleaving.
    *
    * Plan: one filter per branch + a typed mapPartitions + unionByName —
    * completely NARROW, zero shuffles at any corpus size. `extraCols` are
    * carried through unchanged (e.g. `partition_id` for the resumable
    * job). */
  def stripInterleaved(spans: DataFrame, extraCols: Seq[String] = Nil)
      : DataFrame = {
    val cols = Seq("doc_id", "kind", "text", "media_ref", "offset") ++
      extraCols
    val schema = StructType(Seq(
      StructField("doc_id", StringType, nullable = true),
      StructField("kind", StringType, nullable = true),
      StructField("text", StringType, nullable = true),
      StructField("media_ref", StringType, nullable = true),
      StructField("offset", IntegerType, nullable = true)) ++
      extraCols.map(spans.schema(_)))
    val src = spans.select(col("doc_id").cast("string") +: col("kind") +:
      col("text") +: col("media_ref") +: col("offset").cast("int") +:
      extraCols.map(col): _*)
    // null-safe split: a null kind must land in the cleaned branch, not
    // vanish (kind =!= "media" is null-false on BOTH branches otherwise)
    val media = src.filter(col("kind") <=> "media")
    val cleaned = src.filter(!(col("kind") <=> "media")).mapPartitions { it =>
      it.flatMap { r =>
        val html = if (r.isNullAt(2)) "" else r.getString(2)
        val t = textNodes(html).iterator.filter(!_.inAnchor).map(_.text)
          .mkString(" ")
        if (t.isEmpty) Iterator.empty
        else Iterator.single(Row.fromSeq(
          r.get(0) +: r.get(1) +: t +: r.get(3) +: r.get(4) +:
            (5 until r.length).map(r.get)))
      }
    }(Encoders.row(schema))
    cleaned.unionByName(media.select(cols.map(col): _*))
  }

  /** Readability-style container selection over [[nodesDf]] output: group
    * text nodes by parent path, score Σ(n_words − LinkWordPenalty·
    * n_link_words), keep every node of the per-doc argmax container
    * (ties → lexicographically smallest parent). Output adds `parent`,
    * `score`, `content_words`. One groupBy (map-side partial agg) + one
    * per-doc window + one equi-join — shuffles only on the doc key. */
  def mainContent(nodes: DataFrame, idCol: String): DataFrame = {
    val parent = regexp_extract(col("path"), "^(.*)/[^/]*$", 1)
    val scored = nodes.withColumn("parent", parent)
      .groupBy(col(idCol), col("parent"))
      .agg(sum(col("n_words") - lit(LinkWordPenalty) * col("n_link_words"))
        .as("score"),
        sum("n_words").as("content_words"))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc,
      col("parent").asc)
    val win = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    nodes.withColumn("parent", parent)
      .join(win, Seq(idCol, "parent"))
  }

  // ------------------------------------------------------ table extract ----

  final case class Cell(tableIdx: Int, rowIdx: Int, colIdx: Int,
      isHeader: Boolean, text: String)

  /** All `<table>` cells of `html` in document order — the structured-table
    * side output of the extraction tier (the reference ships extracted
    * tables as a JSON side output next to the text layer; an HTML corpus
    * needs the same for `<table>` markup). Single pass, same tag-boundary
    * rules as [[textNodes]] (shared [[scanTagEnd]]/[[skipRawText]]),
    * lenient like a browser:
    *  - `table_idx` counts `<table>` opens in document order (nested
    *    tables get their own index); `row_idx`/`col_idx` are 0-based;
    *  - `<td>`/`<th>` with no explicit close are closed by the next
    *    cell/row/table boundary (the HTML5 implied end everyone omits);
    *    a cell before any `<tr>` implies row 0;
    *  - EMPTY cells are emitted (structure matters: a missing cell shifts
    *    every later `col_idx` in the row);
    *  - text inside a nested table belongs to the INNER table's open cell;
    *    text after the inner table closes resumes the outer cell;
    *  - any tag inside an open cell contributes a space (so `a<br>b` stays
    *    two words), then [[collapse]] normalizes;
    *  - text outside any open cell is not tabular and is ignored here
    *    ([[textNodes]] is the text-layer walker).
    */
  def tableCells(html: String): Vector[Cell] = {
    val n = html.length
    val out = Vector.newBuilder[Cell]
    var tableCounter = 0
    // innermost-last stack of open tables
    final class Ctx(val tableIdx: Int) {
      var row: Int = -1
      var col: Int = -1
      var cellOpen: Boolean = false
      var isHeader: Boolean = false
      val buf = new StringBuilder
    }
    val ctxs = ArrayBuffer.empty[Ctx]
    def top: Ctx = ctxs.last

    def closeCell(): Unit = if (ctxs.nonEmpty && top.cellOpen) {
      val c = top
      out += Cell(c.tableIdx, if (c.row < 0) 0 else c.row, c.col,
        c.isHeader, collapse(c.buf.toString))
      c.cellOpen = false
      c.buf.clear()
    }

    def openCell(header: Boolean): Unit = if (ctxs.nonEmpty) {
      closeCell()
      val c = top
      if (c.row < 0) c.row = 0
      c.col += 1
      c.cellOpen = true
      c.isHeader = header
      c.buf.clear()
    }

    // a tag boundary inside an open cell separates words
    def tagSpace(): Unit = if (ctxs.nonEmpty && top.cellOpen) top.buf.append(' ')

    var i = 0
    while (i < n) {
      val c = html(i)
      if (c != '<' || i + 1 >= n) {
        if (ctxs.nonEmpty && top.cellOpen) top.buf.append(c)
        i += 1
      } else {
        val c1 = html(i + 1)
        if (c1 == '!') {
          tagSpace()
          if (html.startsWith("<!--", i)) {
            val e = html.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3
          } else {
            val e = html.indexOf('>', i + 2)
            i = if (e < 0) n else e + 1
          }
        } else if (c1 == '?') {
          tagSpace()
          val e = html.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else if (c1 == '/') {
          var j = i + 2
          val s = j
          while (j < n && isNameChar(html(j))) j += 1
          val name = html.substring(s, j).toLowerCase
          val e = html.indexOf('>', j)
          i = if (e < 0) n else e + 1
          name match {
            case "td" | "th" | "tr" => closeCell()
            case "table" =>
              if (ctxs.nonEmpty) { closeCell(); ctxs.remove(ctxs.length - 1) }
              tagSpace() // the popped table separates the OUTER cell's words
            case _ => tagSpace()
          }
        } else if (isNameStart(c1)) {
          var j = i + 1
          while (j < n && isNameChar(html(j))) j += 1
          val name = html.substring(i + 1, j).toLowerCase
          val (after, self) = scanTagEnd(html, j)
          i = after
          if (RawTextTags.contains(name) && !self) {
            tagSpace() // the skipped element is still a word boundary
            i = skipRawText(html, name, i)
          } else name match {
            case "table" if !self =>
              tagSpace() // entering a nested table separates outer words
              ctxs += new Ctx({ val t = tableCounter; tableCounter += 1; t })
            case "tr" if ctxs.nonEmpty =>
              closeCell(); top.row += 1; top.col = -1
            case "td" => openCell(header = false)
            case "th" => openCell(header = true)
            case _ => tagSpace()
          }
        } else {
          if (ctxs.nonEmpty && top.cellOpen) top.buf.append(c)
          i += 1
        }
      }
    }
    // lenient EOF recovery: close every still-open cell, innermost first
    while (ctxs.nonEmpty) { closeCell(); ctxs.remove(ctxs.length - 1) }
    out.result()
  }

  val TableSchema: StructType = StructType(Seq(
    StructField("doc", StringType, nullable = true),
    StructField("table_idx", LongType, nullable = false),
    StructField("row_idx", LongType, nullable = false),
    StructField("col_idx", LongType, nullable = false),
    StructField("is_header", BooleanType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** Render [[tablesDf]] cell rows as GitHub-markdown tables — the
    * serialization LLM training corpora actually use for tabular content
    * (a flat text layer loses the structure; markdown keeps it and stays
    * prose-tokenizable). One `| a | b |` line per row, cells in col_idx
    * order, `|` escaped; a `| --- | ... |` separator after row 0 iff
    * row 0 is all-header (the GitHub table contract).
    *
    * Output: (idCol, table_idx, md). Plan: two bounded-key partial-agg
    * groupBys — (id, table, row) then (id, table); per-group array state
    * is one TABLE, which is document-bounded (unlike corpus-keyed state,
    * this cannot hot-spot). */
  def tablesToMarkdown(cells: DataFrame, idCol: String): DataFrame = {
    val esc = regexp_replace(col("text"), "\\|", "\\\\|")
    val rows = cells
      .groupBy(col(idCol), col("table_idx"), col("row_idx"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("col_idx"), esc.as("t")))),
          x => x.getField("t")), " | ").as("body"),
        min(col("is_header").cast("int")).as("all_hdr"),
        count(lit(1)).as("n_cols"))
      .select(col(idCol), col("table_idx"), col("row_idx"),
        concat(lit("| "), col("body"), lit(" |")).as("line"),
        col("all_hdr"), col("n_cols"))
    val tables = rows.groupBy(col(idCol), col("table_idx"))
      .agg(array_sort(collect_list(struct(col("row_idx"), col("line"),
        col("all_hdr"), col("n_cols")))).as("rs"))
    val first = element_at(col("rs"), 1)
    val sep = concat(lit("| "),
      array_join(transform(sequence(lit(1), first.getField("n_cols")),
        _ => lit("---")), " | "), lit(" |"))
    val rest = array_join(transform(
      slice(col("rs"), lit(2), greatest(size(col("rs")) - 1, lit(0))),
      x => x.getField("line")), "\n")
    val md = concat(first.getField("line"),
      when(first.getField("all_hdr") === 1, concat(lit("\n"), sep))
        .otherwise(lit("")),
      when(size(col("rs")) > 1, concat(lit("\n"), rest)).otherwise(lit("")))
    tables.select(col(idCol), col("table_idx"), md.as("md"))
  }

  /** One row per table cell: (idCol, table_idx, row_idx, col_idx,
    * is_header, text). Typed mapPartitions over (id, html) — narrow, zero
    * shuffles at any corpus size; null/empty html yields no rows. */
  def tablesDf(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("string").as("doc"),
      col(htmlCol).as("__html"))
    src.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getString(0)
        val html = if (r.isNullAt(1)) "" else r.getString(1)
        tableCells(html).iterator.map(c =>
          Row(id, c.tableIdx.toLong, c.rowIdx.toLong, c.colIdx.toLong,
            c.isHeader, c.text))
      }
    }(Encoders.row(TableSchema)).withColumnRenamed("doc", idCol)
  }
}
