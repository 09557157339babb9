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
}
