package graft.pipeline

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Ckpt

/** Data SELECTION for training-corpus curation — the two standard
  * distribution-level filters that sit beside dedup/quality in large LLM
  * pipelines:
  *
  *   - `lmBits`: bigram language-model negative log-likelihood (bits per
  *     bigram) — the CCNet-style "perplexity" quality signal (Wenzek et al.
  *     2020 use a KenLM 5-gram; the bigram form is the same estimator shape
  *     with the same Spark plan: count → join → per-doc average).
  *   - `dsirWeights`: hashed-ngram importance weights log(p_target/p_raw)
  *     (Xie et al. 2023, "Data Selection for Language Models via Importance
  *     Resampling") against a caller-supplied target corpus.
  *
  * Both run on the shared `occRows` projection: one posexplode over the
  * corpus, per-token 31-bit polynomial hashes computed ONCE per token (flat
  * codegen — Dedup.tokenHash/tokenHash2), a window `lead` for the bigram
  * partner, 62-bit ids thereafter — every downstream shuffle moves 8-byte
  * longs, never token strings (the Dedup round-3 lesson). Counts aggregate
  * with map-side combine; nothing unbounded is broadcast: the LM model
  * tables join SHUFFLED (a 100-TB corpus has a vocabulary-sized model),
  * while DSIR's λ table is B rows by construction (B a caller parameter)
  * and rides a broadcast join after a bounded driver-side collect — the
  * "collect a bounded aggregate" pattern, not a corpus collect. */
object Selection {

  private val P  = 2147483647L // 2^31 - 1 (leading-window hash modulus)
  private val P2 = 2147483629L // trailing-window hash modulus
  private val K  = Dedup.shingleK

  /** One row per token OCCURRENCE: (doc_id, uid, bid) where `uid` is the
    * 62-bit token id (leading ⊕ trailing window hash, exactly
    * `Dedup.shingleId`) and `bid` the 62-bit id of the bigram starting
    * here (null on each doc's last token). Same plan shape as
    * `Dedup.shingleIdRows`: hashes beside the generator in their own
    * codegen projection, then a per-doc window lead. */
  private def occRows(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(split(trim(col("text")), " +")).as(Seq("pos", "tok")))
    val hashed = toks.select(col("doc_id"), col("pos"),
      Dedup.tokenHash(col("tok")).as("h1"), Dedup.tokenHash2(col("tok")).as("h2"))
    val wnd = Window.partitionBy("doc_id").orderBy("pos")
    hashed
      .select(col("doc_id"), col("h1"), col("h2"),
        lead("h1", 1).over(wnd).as("n1"), lead("h2", 1).over(wnd).as("n2"))
      .select(col("doc_id"),
        (col("h1") * 2147483648L + col("h2")).as("uid"),
        when(col("n1").isNotNull,
          ((col("h1") * K + col("n1")) % P) * 2147483648L +
            (col("h2") * K + col("n2")) % P2).as("bid"))
  }

  /** Bigram-LM quality score: for each document, the average
    * -log2 P(w2|w1) over its bigrams under an add-k model estimated on the
    * WHOLE corpus — P(w2|w1) = (C(w1,w2)+k) / (C(w1)+k·V), V = vocabulary
    * size. Low bits = predictable, in-distribution text; high bits = noise
    * (the CCNet split). Output (doc_id, n_bigrams, lm_bits), one row per
    * input document (lm_bits null iff the doc has no bigram).
    *
    * The model (unigram+bigram counts) is materialized once
    * (vocabulary-sized state — it IS the LM; session-lifetime like every
    * Ckpt rewrap) and both count joins run SHUFFLED on 62-bit ids: the
    * vocabulary of a web corpus is unbounded, so neither side is
    * broadcast-safe. */
  def lmBits(docs: DataFrame, k: Double = 0.5): DataFrame = {
    // train and score read the SAME corpus here — materialize the occurrence
    // projection once so the tokenize + per-doc window pass (the expensive
    // part of both) runs a single time (guide §1.2)
    val occ = Ckpt.materialize(occRows(docs))
    scoreLmOcc(docs, occ.df, trainLmOcc(occ.df), k)
  }

  /** A trained bigram LM: the unigram+bigram count relation
    * (kind ∈ {u,b}, 62-bit id, count) and the vocabulary size. The counts
    * ARE the model — vocabulary-sized state, so it stays a DataFrame end to
    * end (never collected, never broadcast). Persist with [[saveLm]] /
    * [[loadLm]] so a model trained once on a 100-TB corpus scores later
    * batches across sessions — the north-rule checkpoint/resume discipline
    * applied to the pipeline's model state (VERDICT r4 item 4; previously
    * the counts were rebuilt every session). */
  final case class LmModel(counts: DataFrame, vocab: Long)

  /** Estimate the model: ONE corpus pass produces both count families —
    * each occurrence row explodes to its (u, uid) row plus, when a bigram
    * starts here, its (b, bid) row. A unionByName of two occ selects would
    * scan (and window-sort) the corpus twice for the same aggregation. */
  def trainLm(docs: DataFrame): LmModel = trainLmOcc(occRows(docs))

  private def trainLmOcc(occ: DataFrame): LmModel = {
    val counts = Ckpt.materialize(
      occ.select(col("doc_id"), explode(
          when(col("bid").isNotNull,
            array(struct(lit("u").as("kind"), col("uid").as("id")),
              struct(lit("b").as("kind"), col("bid").as("id"))))
            .otherwise(array(struct(lit("u").as("kind"), col("uid").as("id")))))
          .as("f"))
        .select(col("f.kind").as("kind"), col("f.id").as("id"))
        .groupBy("kind", "id").count()).df
    LmModel(counts, counts.filter(col("kind") === "u").count())
  }

  /** Score `docs` under a (possibly reloaded) model; `k` is the add-k
    * smoothing applied at SCORE time — the persisted counts are raw. Both
    * count joins run SHUFFLED on 62-bit ids (unbounded vocabulary — never
    * broadcast-safe). Out-of-vocabulary tokens/bigrams simply have no count
    * row; the inner join drops those bigrams from the average, matching the
    * in-corpus behavior where every occurring id has a row by construction. */
  def scoreLm(docs: DataFrame, model: LmModel, k: Double = 0.5): DataFrame =
    scoreLmOcc(docs, occRows(docs), model, k)

  private def scoreLmOcc(docs: DataFrame, occ: DataFrame, model: LmModel,
                         k: Double): DataFrame = {
    val cu = model.counts.filter(col("kind") === "u")
      .select(col("id").as("uid"), col("count").as("cu"))
    val cb = model.counts.filter(col("kind") === "b")
      .select(col("id").as("bid"), col("count").as("cb"))
    val bits = occ.filter(col("bid").isNotNull)
      .join(cu, "uid").join(cb, "bid")
      .select(col("doc_id"),
        ((log(col("cu") + k * model.vocab) - log(col("cb") + lit(k)))
          / math.log(2.0)).as("bits"))
    val perDoc = bits.groupBy("doc_id").agg(
      count(lit(1)).as("n_bigrams"), round(avg(col("bits")), 6).as("lm_bits"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("lm_bits"))
  }

  /** Persist a trained LM beside the iteration checkpoints' layout:
    * `<dir>/counts/` (parquet relation) + `<dir>/model.json` (metadata —
    * vocab size, feature-hash identity so a reload can refuse a model
    * trained under a different tokenization). */
  def saveLm(model: LmModel, dir: String): Unit = {
    model.counts.write.mode("overwrite").parquet(s"$dir/counts")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/model.json"),
      s"""{"type":"bigram_lm","vocab":${model.vocab},"features":"shingle62/k=$K"}""")
  }

  def loadLm(spark: SparkSession, dir: String): LmModel = {
    val meta = Files.readString(Paths.get(s"$dir/model.json"))
    require(meta.contains(""""type":"bigram_lm""""),
      s"$dir/model.json is not a bigram_lm model: $meta")
    require(meta.contains(s""""features":"shingle62/k=$K""""),
      s"$dir was trained under a different feature hash: $meta")
    val vocab = """"vocab":(\d+)""".r.findFirstMatchIn(meta)
      .getOrElse(sys.error(s"no vocab field in $dir/model.json")).group(1).toLong
    LmModel(spark.read.parquet(s"$dir/counts"), vocab)
  }

  /** DSIR importance log-weights: features are the unigram+bigram 62-bit
    * ids of `occRows` hashed into `buckets` buckets (default a PRIME — a
    * power of two would see only the trailing-window hash bits); per bucket
    * λ(b) = ln p̂_target(b) − ln p̂_raw(b) with add-k smoothing over the
    * full bucket domain, and a document's weight is Σ λ(bucket) over its
    * feature OCCURRENCES. Resample ∝ exp(weight) to tilt the raw corpus
    * toward the target distribution (Xie et al. 2023).
    *
    * Scale shape: two corpus scans (bucket counts, then the weight pass) +
    * one target scan; the λ table is exactly `buckets` rows — collected to
    * the driver (bounded by the PARAMETER, not the data) and broadcast back
    * into the weight join. Output (doc_id, n_feats, dsir_logw), one row per
    * raw-corpus document. */
  def dsirWeights(docs: DataFrame, target: DataFrame,
                  buckets: Int = 4093, k: Double = 0.5): DataFrame = {
    // the raw-corpus feature stream feeds BOTH the bucket-count estimation
    // and the weight pass — materialize it once instead of re-running the
    // tokenize + window + explode chain per pass (guide §1.2)
    val fr = Ckpt.materialize(feats(docs, buckets))
    scoreDsirFeats(docs, fr.df, trainDsirFeats(fr.df, target, buckets, k))
  }

  /** A trained DSIR model: the λ relation (bucket, lam) — exactly `buckets`
    * rows by construction (bounded by the PARAMETER, not the data), so it is
    * always broadcast-safe at score time. Persist with [[saveDsir]] /
    * [[loadDsir]] to reuse a trained tilt across sessions/corpora. */
  final case class DsirModel(lambda: DataFrame, buckets: Int)

  /** one scan per use (explode both feature kinds from each occurrence
    * row), same single-pass shape as lmBits' count estimation */
  private def feats(d: DataFrame, buckets: Int): DataFrame = {
    val b = lit(buckets.toLong)
    occRows(d).select(col("doc_id"), explode(
      when(col("bid").isNotNull,
        array(pmod(col("uid"), b), pmod(col("bid"), b)))
        .otherwise(array(pmod(col("uid"), b)))).as("bucket"))
  }

  /** Estimate λ(b) = ln p̂_target(b) − ln p̂_raw(b): one raw-corpus scan +
    * one target scan, each collapsing to ≤ `buckets` rows before the
    * bounded driver-side collect. */
  def trainDsir(docs: DataFrame, target: DataFrame,
                buckets: Int = 4093, k: Double = 0.5): DsirModel =
    trainDsirFeats(feats(docs, buckets), target, buckets, k)

  private def trainDsirFeats(rawFeats: DataFrame, target: DataFrame,
                             buckets: Int, k: Double): DsirModel = {
    require(buckets >= 2, "trainDsir needs >= 2 buckets")
    val spark = rawFeats.sparkSession
    def counts(f: DataFrame): Map[Long, Long] =
      f.groupBy("bucket").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cr = counts(rawFeats)
    val ct = counts(feats(target, buckets))
    val nr = cr.values.sum.toDouble
    val nt = ct.values.sum.toDouble
    val lam: Seq[(Long, Double)] = (0L until buckets.toLong).map { b =>
      b -> (math.log((ct.getOrElse(b, 0L) + k) / (nt + k * buckets)) -
        math.log((cr.getOrElse(b, 0L) + k) / (nr + k * buckets)))
    }
    import spark.implicits._
    DsirModel(lam.toDF("bucket", "lam"), buckets)
  }

  /** Weight pass: one corpus scan joined against the broadcast λ table. */
  def scoreDsir(docs: DataFrame, model: DsirModel): DataFrame =
    scoreDsirFeats(docs, feats(docs, model.buckets), model)

  private def scoreDsirFeats(docs: DataFrame, docFeats: DataFrame,
                             model: DsirModel): DataFrame = {
    val perDoc = docFeats.join(broadcast(model.lambda), "bucket")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_feats"), round(sum(col("lam")), 6).as("dsir_logw"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"), col("dsir_logw"))
  }

  /** Persist/reload the λ table: `<dir>/lambda/` (parquet) +
    * `<dir>/model.json` (bucket count + feature-hash identity — a reload
    * refuses a model whose bucketing or tokenization doesn't match). */
  def saveDsir(model: DsirModel, dir: String): Unit = {
    model.lambda.write.mode("overwrite").parquet(s"$dir/lambda")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/model.json"),
      s"""{"type":"dsir","buckets":${model.buckets},"features":"shingle62/k=$K"}""")
  }

  def loadDsir(spark: SparkSession, dir: String): DsirModel = {
    val meta = Files.readString(Paths.get(s"$dir/model.json"))
    require(meta.contains(""""type":"dsir""""),
      s"$dir/model.json is not a dsir model: $meta")
    require(meta.contains(s""""features":"shingle62/k=$K""""),
      s"$dir was trained under a different feature hash: $meta")
    val buckets = """"buckets":(\d+)""".r.findFirstMatchIn(meta)
      .getOrElse(sys.error(s"no buckets field in $dir/model.json")).group(1).toInt
    DsirModel(spark.read.parquet(s"$dir/lambda"), buckets)
  }
}
