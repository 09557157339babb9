package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document's token stream into
  * fixed-size chunks with overlap — the standard preparation step for
  * embedding / RAG indexing and for long-document pretraining where a
  * model's context window is smaller than the document.
  *
  * Chunk i covers tokens [i·stride, i·stride + chunkSize) with
  * stride = chunkSize − overlap; the last chunk may be short; a document
  * with fewer tokens than one chunk yields exactly one chunk; token-less
  * documents yield none. Chunk count is pure integer math
  * (1 + ceil((n − chunkSize)/stride) for n > chunkSize), so any engine
  * replays the boundaries exactly.
  *
  * Plan shape: completely NARROW — tokenize, a per-row transform over the
  * chunk index sequence, one posexplode. No shuffle at any corpus size;
  * chunking parallelism is the scan's. The token array is bound to a
  * column before the transform lambda (interpreted HOFs re-evaluate
  * inlined expressions per element — the documented O(n²) trap). */
object Chunking {

  /** (idCol, chunk_id, n_tokens, chunk_text) per chunk. */
  def chunkDf(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1: $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): $overlap vs $chunkSize")
    val stride = chunkSize - overlap
    val arr = df.select(col(idCol), TextAnalysis.tokensCol(col(textCol)).as("__t"))
    val t = col("__t")
    val n = size(t)
    // integer ceil-division via pmod (Column `/` is FLOAT division): the
    // operand is non-negative in this branch, so pmod subtraction is floor
    val ceilArg = (n - chunkSize + (stride - 1)).cast("long")
    val nc = when(n <= 0, lit(0L)).when(n <= chunkSize, lit(1L))
      .otherwise(lit(1L) +
        ((ceilArg - pmod(ceilArg, lit(stride.toLong))) / stride).cast("long"))
    val chunks = when(nc === 0, array()).otherwise(
      transform(sequence(lit(0L), nc - 1),
        i => slice(t, (i * stride + 1).cast("int"), lit(chunkSize))))
    arr.select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "__c")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        size(col("__c")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__c")).as("chunk_text"))
  }

  /** Pure twin. */
  def chunk(text: String, chunkSize: Int, overlap: Int): Seq[(Long, Long, String)] = {
    require(chunkSize >= 1 && overlap >= 0 && overlap < chunkSize)
    val toks = TextAnalysis.tokens(text)
    val stride = chunkSize - overlap
    val n = toks.length
    val nc =
      if (n == 0) 0L
      else if (n <= chunkSize) 1L
      else 1L + (n - chunkSize + (stride - 1)).toLong / stride
    (0L until nc).map { i =>
      val c = toks.slice((i * stride).toInt, (i * stride).toInt + chunkSize)
      (i, c.length.toLong, c.mkString(" "))
    }
  }

  // ------------------------------------------------ content-defined -------
  /** Content-defined chunking (CDC — the FastCDC/LBFS family): a chunk
    * boundary falls AT character position i whenever the hash of the w-char
    * window ENDING at i lands in the cut set (`hash mod 2^maskBits == 0`),
    * so boundaries follow the CONTENT, not absolute offsets. That is the
    * property fixed-size chunking lacks and dedup storage needs: insert one
    * byte mid-document and every fixed-size chunk after the edit shifts and
    * re-uploads, while CDC chunks re-align within one window width — only
    * the chunks overlapping the edit change. Expected chunk length is
    * 2^maskBits characters.
    *
    * Two deliberate deviations from stateful CDC implementations, both so
    * any engine can replay boundaries exactly (no sequential scan state):
    *  - the window hash is the md5-derived [[TextAnalysis.hash60]] of the
    *    window text (domain-prefixed "cdc:"), not a rolling Gear/Rabin
    *    state — same boundaries, O(w) per position instead of O(1), a
    *    constant-factor trade for bit-exact cross-engine replay;
    *  - no minimum chunk length (a min-cut suppressor makes each boundary
    *    depend on the previous KEPT boundary — a sequential chain). The
    *    degenerate side that hurts storage, oversized chunks, IS bounded:
    *    spans longer than `maxLen` split at fixed `maxLen` offsets.
    *
    * Plan shape: completely NARROW — per-row position filter + span
    * assembly + one posexplode; no shuffle at any corpus size. Every
    * document's text re-assembles exactly from its chunks in chunk_id
    * order (asserted in the spec); empty documents yield no rows.
    *
    * Output: (idCol, chunk_id, start (1-based), len, chunk_text). */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      windowLen: Int = 16, maskBits: Int = 6, maxLen: Int = 256): DataFrame = {
    require(windowLen >= 2, s"windowLen must be >= 2: $windowLen")
    require(maskBits >= 1 && maskBits <= 20, s"maskBits out of range: $maskBits")
    require(maxLen >= windowLen, s"maxLen must be >= windowLen: $maxLen vs $windowLen")
    val mask = 1L << maskBits
    val base = df.select(col(idCol), col(textCol).as("__x"))
      .filter(length(col("__x")) > 0)
    val text = col("__x")
    val len = length(text).cast("long")
    // boundary ends: every window-end position whose window hash cuts,
    // then the document end (array_union dedups when len is a boundary)
    val cutEnds = when(len < windowLen, array().cast("array<bigint>"))
      .otherwise(filter(sequence(lit(windowLen.toLong), len), i =>
        pmod(TextAnalysis.hash60(
          concat(lit("cdc:"), text.substr((i - windowLen + 1).cast("int"), lit(windowLen)))),
          lit(mask)) === 0))
    val ends = array_union(cutEnds, array(len))
    // spans between consecutive ends (start = previous end + 1), each
    // split at fixed maxLen offsets: nPieces = ceil(m/maxLen), all pure
    // integer math so any engine replays the cut points exactly
    val spans = transform(col("__ends"), (e, k) =>
      struct(
        (when(k === 0, lit(0L))
          .otherwise(element_at(col("__ends"), k)) + 1L).as("s"),
        (e - when(k === 0, lit(0L)).otherwise(element_at(col("__ends"), k)))
          .as("m")))
    val pieces = flatten(transform(col("__spans"), sp => {
      val s = sp.getField("s")
      val m = sp.getField("m")
      val np = floor((m - 1L).cast("double") / maxLen).cast("long") + 1L
      transform(sequence(lit(0L), np - 1L), j =>
        struct((s + j * maxLen).as("start"),
          least(lit(maxLen.toLong), m - j * maxLen).as("len")))
    }))
    base.withColumn("__ends", ends)
      .withColumn("__spans", spans)
      .select(col(idCol), text, posexplode(pieces))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_id"),
        col("col.start").as("start"), col("col.len").as("len"),
        text.substr(col("col.start").cast("int"), col("col.len").cast("int"))
          .as("chunk_text"))
  }

  /** Pure twin of [[cdcChunks]]: (chunk_id, start, len, chunk_text). */
  def cdcChunk(text: String, windowLen: Int = 16, maskBits: Int = 6,
      maxLen: Int = 256): Seq[(Long, Long, Long, String)] = {
    if (text == null || text.isEmpty) return Seq.empty
    val mask = 1L << maskBits
    val n = text.length.toLong
    val cuts = (windowLen.toLong to n).filter { i =>
      val wdw = text.substring((i - windowLen).toInt, i.toInt)
      math.floorMod(TextAnalysis.hash60("cdc:" + wdw), mask) == 0
    }
    val ends = (cuts :+ n).distinct.sorted
    val spans = ends.zipWithIndex.map { case (e, k) =>
      (if (k == 0) 1L else ends(k - 1) + 1L, e)
    }
    val pieces = spans.flatMap { case (s, e) =>
      val m = e - s + 1
      (0L until ((m - 1) / maxLen + 1)).map { j =>
        val st = s + j * maxLen
        (st, math.min(maxLen.toLong, m - j * maxLen))
      }
    }
    pieces.zipWithIndex.map { case ((st, l), k) =>
      (k.toLong, st, l, text.substring((st - 1).toInt, (st - 1 + l).toInt))
    }
  }
}
