package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document chunking and sequence packing — the two layout transforms
  * between a cleaned corpus and a training/retrieval consumer:
  *
  *  - [[chunkWindows]]: overlapping token-window chunks per document
  *    (retrieval / long-doc eval shape: every token appears in ≥1 chunk,
  *    consecutive chunks share `window - stride` tokens of context).
  *  - [[packSequences]]: concat-and-chop context-window packing (the
  *    pretraining shape popularized by GPT-style pipelines and T5/C4:
  *    documents are concatenated in a deterministic order and the stream
  *    is chopped into fixed token-budget sequences; a document may span a
  *    chop boundary).
  *
  * Both are pure whole-stage-codegen column programs with an exact ANSI-SQL
  * twin for the DuckDB oracle, and both are layout-independent: results are
  * a function of row CONTENT (doc_id, text), never of partition boundaries
  * or cluster size — the [[Sampling]] reproducibility discipline applied to
  * layout transforms.
  *
  * 100-TB shape:
  *  - chunking is embarrassingly parallel (a per-row flatMap, zero
  *    shuffles; output fan-out is bounded by ceil(tokens/stride) per doc).
  *  - packing needs a global order within each pack stream, which cannot
  *    be a single total order at scale. The contract is the standard one:
  *    the corpus is sharded into `nBins` independent pack streams by a
  *    deterministic hash of doc_id, and the cumulative-offset window runs
  *    PER BIN — one shuffle on the bin key, then a sort of corpus/nBins
  *    rows per bin. Pack identity is deterministic GIVEN nBins (a config
  *    constant of the pipeline, not of the cluster), exactly like the
  *    sharded packing of real pretraining pipelines.
  */
object Chunking {

  /** Overlapping token-window chunks. Tokenization is the pipeline-wide
    * whitespace contract ([[TextOps.tokens]]). A document with `n` tokens
    * produces `1 + max(0, ceil((n - window)/stride))` chunks (always ≥1,
    * so empty/short docs keep exactly one row and no data is dropped);
    * chunk `i` covers tokens `[i*stride, i*stride + window)`, the last
    * chunk truncating at the end of the document.
    *
    * The token array is projected in its own select BELOW the explode so
    * the split runs once per document, not once per generated chunk (the
    * Generate node re-evaluates its select-mates per output row).
    */
  def chunkWindows(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("n_chunks", expr( // exact BIGINT div, not double division
        s"1L + (greatest(0L, size(toks) - ${window}L) + ${stride - 1}L) div ${stride}L"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        slice(col("toks"), (col("chunk_id") * stride + 1).cast("int"), lit(window))
          .as("ctoks"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("ctoks")).cast("long").as("n_chunk_tokens"),
        md5(encode(array_join(col("ctoks"), " "), "UTF-8")).as("chunk_md5"))
  }

  /** Concat-and-chop sequence packing. Documents are sharded into `nBins`
    * deterministic pack streams (`doc_id % nBins` — content-derived, not
    * layout-derived), concatenated within each bin in doc_id order, and the
    * token stream is chopped every `budget` tokens. Each document reports
    * the packs it lands in: `pack_first = floor(start/budget)`,
    * `pack_last = floor((end-1)/budget)` (end-exclusive cumulative offset),
    * and its offset inside the first pack. Zero-token documents occupy no
    * stream space and are assigned to the pack at their start offset.
    *
    * All offset arithmetic is exact BIGINT (`div`, not double division):
    * a 100-TB bin stream overflows double-mantissa token offsets long
    * before it overflows int64.
    */
  /** per-doc stream coordinates shared by [[packSequences]] and
    * [[packManifest]]: (doc_id, bin, n_tok, start_off, cum_end) with
    * end-exclusive BIGINT offsets inside each bin's concat stream.
    *
    * CONTRACT (ADVICE r5): `doc_id` must be NON-NEGATIVE. The bin here is
    * `pmod(doc_id, nBins)` while the SQL oracle twins use truncated
    * `doc_id % nBins` — identical on [0, ∞) but divergent for negative
    * ids. Every corpus this engine synthesizes/ingests keys docs by
    * non-negative ids; callers with signed ids must remap first. */
  private def streamOffsets(docs: DataFrame, nBins: Int): DataFrame = {
    val nt = size(TextOps.tokens(col("text"))).cast("long")
    val w = Window.partitionBy(col("bin")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), pmod(col("doc_id"), lit(nBins.toLong)).as("bin"),
        nt.as("n_tok"))
      .withColumn("cum_end", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("bin"), col("n_tok"),
        (col("cum_end") - col("n_tok")).as("start_off"), col("cum_end"))
  }

  def packSequences(docs: DataFrame, budget: Long, nBins: Int): DataFrame = {
    require(budget > 0 && nBins > 0)
    streamOffsets(docs, nBins)
      .select(col("doc_id"), col("bin"), col("n_tok"),
        expr(s"start_off div ${budget}L").as("pack_first"),
        expr(s"greatest(start_off, cum_end - 1) div ${budget}L").as("pack_last"),
        expr(s"start_off % ${budget}L").as("pack_offset"))
  }

  /** The pack-side view of [[packSequences]] — the manifest a trainer
    * materializes sequences from: one row per (pack, doc) with the doc's
    * local token sub-range `[tok_from, tok_from + n_slice)` that lands in
    * that pack. Every pack except each bin's last sums to exactly
    * `budget` slice tokens; a doc's slices are contiguous and sum to its
    * token count; zero-token docs emit nothing (they occupy no stream
    * space). Same shapes as packing itself: one bin-window shuffle, then
    * a per-row explode bounded by ceil(n_tok/budget)+1 packs per doc. */
  def packManifest(docs: DataFrame, budget: Long, nBins: Int): DataFrame = {
    require(budget > 0 && nBins > 0)
    streamOffsets(docs, nBins)
      .select(col("doc_id"), col("bin"), col("n_tok"), col("start_off"),
        explode(expr(
          s"sequence(start_off div ${budget}L, greatest(start_off, cum_end - 1) div ${budget}L)"))
          .as("pack_id"))
      .select(col("bin"), col("pack_id"), col("doc_id"),
        greatest(lit(0L), col("pack_id") * budget - col("start_off")).as("tok_from"),
        (least(col("n_tok"), (col("pack_id") + 1) * budget - col("start_off")) -
          greatest(lit(0L), col("pack_id") * budget - col("start_off"))).as("n_slice"))
      .filter(col("n_slice") > 0)
  }

  /** The oracle twins (kept beside the operators so the two formulations
    * evolve together; SparkEntry splices them into `oracleSql`). */
  def chunkWindowsSql(window: Int, stride: Int): String =
    s"""WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS toks
       |  FROM documents),
       |n AS (SELECT doc_id, toks,
       |  1 + (greatest(0, len(toks) - $window) + ${stride - 1}) // $stride AS nc
       |  FROM d)
       |SELECT doc_id, u.i AS chunk_id,
       |  CAST(len(toks[u.i*$stride+1 : u.i*$stride+$window]) AS BIGINT)
       |    AS n_chunk_tokens,
       |  md5(array_to_string(toks[u.i*$stride+1 : u.i*$stride+$window], ' '))
       |    AS chunk_md5
       |FROM n, unnest(range(0, nc)) u(i)""".stripMargin

  def packManifestSql(budget: Long, nBins: Int): String =
    s"""WITH d AS (SELECT doc_id, doc_id % $nBins AS bin,
       |  CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS n_tok
       |  FROM documents),
       |c AS (SELECT doc_id, bin, n_tok,
       |  CAST(sum(n_tok) OVER (PARTITION BY bin ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cum_end FROM d),
       |p AS (SELECT doc_id, bin, n_tok, cum_end - n_tok AS s, cum_end AS e
       |  FROM c),
       |x AS (SELECT doc_id, bin, n_tok, s, u.p AS pack_id
       |  FROM p, unnest(range(s // $budget, greatest(s, e - 1) // $budget + 1))
       |    u(p))
       |SELECT bin, pack_id, doc_id,
       |  greatest(0, pack_id * $budget - s) AS tok_from,
       |  least(n_tok, (pack_id + 1) * $budget - s)
       |    - greatest(0, pack_id * $budget - s) AS n_slice
       |FROM x
       |WHERE least(n_tok, (pack_id + 1) * $budget - s)
       |    - greatest(0, pack_id * $budget - s) > 0""".stripMargin

  def packSequencesSql(budget: Long, nBins: Int): String =
    s"""WITH d AS (SELECT doc_id, doc_id % $nBins AS bin,
       |  CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS n_tok
       |  FROM documents),
       |c AS (SELECT doc_id, bin, n_tok,
       |  CAST(sum(n_tok) OVER (PARTITION BY bin ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cum_end FROM d)
       |SELECT doc_id, bin, n_tok,
       |  (cum_end - n_tok) // $budget AS pack_first,
       |  greatest(cum_end - n_tok, cum_end - 1) // $budget AS pack_last,
       |  (cum_end - n_tok) % $budget AS pack_offset
       |FROM c""".stripMargin
}
