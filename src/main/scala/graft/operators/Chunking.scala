package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Token-window chunking — split each document into (optionally
  * overlapping) fixed-size token windows, the unit RAG indexes and
  * context-window training shards consume.
  *
  * Chunks are built over the pipeline's normalized token stream (the same
  * lowercased whitespace tokens every other text operator uses), so chunk
  * boundaries are reproducible across engines — the DuckDB oracle slices
  * the identical token lists.
  *
  * Entirely row-local (tokenize + slice + explode): no shuffle, scan speed
  * at any corpus size; output volume is ceil(n/stride) rows per doc.
  */
object Chunking {

  /** One row per chunk: (idCol, chunk_idx, chunk_start, n_chunk_tokens,
    * chunk_text). `chunk_start` is the 0-based token offset; the final
    * chunk may be shorter than `chunkSize`; docs with no tokens produce no
    * rows. stride < chunkSize gives overlapping windows. */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize $chunkSize")
    require(stride >= 1, s"stride $stride")
    val toks = TextAnalysis.tokens(col(textCol))
    val n = size(col("__toks"))
    df.withColumn("__toks", toks)
      .withColumn("__starts",
        when(n > 0, sequence(lit(0), n - 1, lit(stride))).otherwise(array()))
      .select(col(idCol), col("__toks"),
        posexplode(col("__starts")).as(Seq("chunk_idx", "chunk_start")))
      .withColumn("__chunk",
        slice(col("__toks"), col("chunk_start") + 1, lit(chunkSize)))
      .select(col(idCol), col("chunk_idx"), col("chunk_start"),
        size(col("__chunk")).as("n_chunk_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }
}
