package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language-ID heuristic, fingerprinting.
  * All pure Column expressions (whole-stage codegen, no UDFs), designed so
  * an identical ANSI-SQL formulation exists for the DuckDB oracle.
  */
object TextOps {

  def tokens(text: Column): Column = split(trim(text), " +")

  /** whitespace token count + a BPE-ish size estimate (≈ chars/4, the usual
    * subword heuristic). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      ceil(length(col("text")) / 4.0).cast("long").as("n_bpe_est"))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Quality scoring: length, mean word length, stopword ratio, alpha ratio.
    * Score formula is arbitrary-but-deterministic; the operator shape
    * (multi-feature doc scoring in one projection) is what matters. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks)
    val stopCnt = size(filter(toks, t => t.isin(stopwords: _*)))
    val alphaChars = length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
    docs.select(
      col("doc_id"),
      nTok.cast("long").as("n_tokens"),
      round(length(regexp_replace(col("text"), " ", "")).cast("double") /
        greatest(nTok, lit(1)), 6).as("mean_word_len"),
      round(stopCnt.cast("double") / greatest(nTok, lit(1)), 6).as("stopword_ratio"),
      round(alphaChars.cast("double") / greatest(length(col("text")), lit(1)), 6)
        .as("alpha_ratio"))
  }

  /** Language-ID heuristic: score each candidate language by marker-token
    * hits, pick argmax with deterministic tie-break (lexicographic). */
  def langId(docs: DataFrame): DataFrame = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "is"),
      "de" -> Seq("der", "die", "und", "ist"),
      "fr" -> Seq("le", "la", "et", "est"))
    val toks = tokens(col("text"))
    val scores = markers.map { case (lang, ms) =>
      (lang, size(filter(toks, t => t.isin(ms: _*))))
    }
    // argmax with tie-break on language name: fold over (score, lang) pairs
    val best = scores.map { case (lang, s) =>
      struct(s.as("s"), lit(lang).as("l"))
    }.reduce((a, b) =>
      when(b.getField("s") > a.getField("s"), b).otherwise(a))
    docs.select(col("doc_id"), best.getField("l").as("lang_pred"),
      best.getField("s").cast("long").as("marker_hits"))
  }

  /** Document fingerprint: md5 of punctuation-stripped lowercased text, plus
    * a 32-bit rolling-polynomial hash of the first 16 normalized chars
    * (horner over code points — pure arithmetic, portable to SQL). */
  def fingerprints(docs: DataFrame): DataFrame = {
    val norm = lower(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))
    val head16 = substring(concat(norm, lit("################")), 1, 16)
    val roll = (1 to 16).map { i =>
      // ascii(substr) * 31^(16-i) mod 2^31-1, summed
      (ascii(substring(head16, i, 1)).cast("long") * powMod31(16 - i)) % 2147483647L
    }.reduce(_ + _) % 2147483647L
    docs.select(col("doc_id"), md5(norm.cast("binary")).as("fingerprint"),
      roll.as("rolling_hash"))
  }

  // 31^k mod (2^31-1) precomputed on the driver
  private def powMod31(k: Int): Long = {
    var r = 1L; var i = 0
    while (i < k) { r = r * 31 % 2147483647L; i += 1 }
    r
  }

  /** the character universe the entropy score is computed over */
  val entropyChars: Seq[Char] = ('a' to 'z') :+ ' '

  /** Character-distribution Shannon entropy over lowercase letters + space —
    * the classic cheap gibberish/boilerplate detector (natural-language text
    * sits near 4.1 bits; mashed keys, base64 blobs, and repeated templates
    * fall well outside). Computed by the native one-pass codegen expression
    * `graft.functions.CharEntropy` (the composable replace-and-diff
    * formulation rescans the document 27×: 7.3s → sub-second at sf0.1); the
    * fixed a..z+space term order means an identical-association ANSI-SQL
    * formulation exists for the oracle. Null/empty text scores 0.0. */
  def charEntropy(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      coalesce(graft.functions.CharEntropy(col("text")), lit(0.0))
        .as("char_entropy"))

  /** Gopher-style repetition signals (Rae et al. 2021, Table A1): fraction
    * of duplicate word bigrams/trigrams and the share of the single most
    * frequent bigram. High values flag boilerplate, templated spam, and
    * degenerate repetition — the canonical cheap filters of every LLM data
    * pipeline. Shape: posexplode + per-doc window leads (the shingle plan
    * from Dedup, but with exact STRING n-grams — fractions must be exact
    * for the oracle, and the (doc_id, gram) aggregation bounds rows at
    * ≤ tokens-per-doc either way), then a two-level aggregation: counts per
    * (doc, gram), then total/distinct/max per doc. Docs with fewer than
    * n tokens score 0.0. Separator  cannot occur in " +"-split
    * tokens, so gram strings are unambiguous. */
  def gopherRepetition(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val wnd = Window.partitionBy("doc_id").orderBy("pos")
    val grams = toks.select(col("doc_id"),
      concat_ws("", col("tok"), lead("tok", 1).over(wnd)).as("bg"),
      concat_ws("", col("tok"), lead("tok", 1).over(wnd),
        lead("tok", 2).over(wnd)).as("tg"),
      lead("tok", 1).over(wnd).isNotNull.as("_has2"),
      lead("tok", 2).over(wnd).isNotNull.as("_has3"))
    def fracs(gram: String, flag: String, pfx: String) = {
      val perGram = grams.filter(col(flag))
        .groupBy(col("doc_id"), col(gram)).agg(count(lit(1)).as("n"))
      perGram.groupBy("doc_id").agg(
        sum(col("n")).as(s"${pfx}_total"),
        count(lit(1)).as(s"${pfx}_distinct"),
        max(col("n")).as(s"${pfx}_top"))
    }
    val b = fracs("bg", "_has2", "b")
    val t = fracs("tg", "_has3", "t")
    docs.select(col("doc_id"))
      .join(b, Seq("doc_id"), "left")
      .join(t, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(lit(1.0) - coalesce(col("b_distinct").cast("double") /
          col("b_total"), lit(1.0)), 6).as("dup2_frac"),
        round(lit(1.0) - coalesce(col("t_distinct").cast("double") /
          col("t_total"), lit(1.0)), 6).as("dup3_frac"),
        round(coalesce(col("b_top").cast("double") / col("b_total"),
          lit(0.0)), 6).as("top2_frac"))
  }

  /** PII detection + redaction: emails, phone-like digit runs, IPv4
    * literals → `<EMAIL>`/`<PHONE>`/`<IP>` placeholders plus per-doc match
    * counts. Pure regexp Column expressions in the Java-regex ∩ RE2 subset
    * (no lookaround), so the DuckDB oracle runs the IDENTICAL patterns;
    * redaction order is email → phone → ip (emails contain digit runs a
    * later phone pass must not see). The usual caveat applies and is part
    * of the contract: these are the standard high-precision crawl-pipeline
    * patterns, not a full PII model. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val phoneRe = "[+][0-9][0-9\\-]{7,}[0-9]"
  val ipRe = "\\b[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}\\b"

  def piiScrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(t, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipRe, "<IP>")
    docs.select(col("doc_id"),
      size(regexp_extract_all(t, lit(emailRe), lit(0))).as("n_email"),
      size(regexp_extract_all(t, lit(phoneRe), lit(0))).as("n_phone"),
      size(regexp_extract_all(t, lit(ipRe), lit(0))).as("n_ip"),
      scrubbed.as("text_scrubbed"))
  }

  /** BM25 relevance of every document to a bag of query terms (Robertson–
    * Spärck Jones idf with Lucene's +1 floor; Okapi tf saturation). The
    * retrieval primitive of corpus curation: "documents about X" selection,
    * seed-query filtering, relevance-weighted sampling.
    *
    * Scale shape: the ONLY per-token work is the explode + an `isin` filter
    * that discards non-query terms BEFORE any shuffle, so the tf aggregation
    * is over ≤ |terms| rows per document. Corpus statistics (N, avgdl, df)
    * stay in-plan as broadcast one-row/|terms|-row relations — no driver
    * collect. avgdl is sum(long)/count (exact integer sum, one division) so
    * the oracle reproduces it bit-exactly.
    */
  def bm25(docs: DataFrame, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val dl = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("dl"))
    val stats = dl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df")) // tf is 1 row/(doc,term)
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val sat = col("tf") * (k1 + 1) /
      (col("tf") + (lit(1 - b) + lit(b) * col("dl") / col("avgdl")) * k1)
    tf.join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(sum(idf * sat).as("bm25"))
  }

  /** Per-document top-k terms by smoothed TF-IDF (the sklearn convention:
    * idf = ln((1+N)/(1+df)) + 1 — df smoothing, never negative). Unlike
    * bm25's seed-query `isin` filter this keeps the FULL vocabulary: df is
    * one (term) hash aggregation over the distinct (doc, term) relation —
    * the standard corpus-wide fit cost — and that relation is NOT broadcast
    * (unbounded domain); only the one-row N is. Each score is a scalar
    * product of exact counts (no float aggregation anywhere), rounded to
    * 1e-9 BEFORE the per-doc rank window so tie-breaks (score desc, term)
    * are cross-engine deterministic. Output (doc_id, term, score, rank). */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfT, "term").crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"),
        round(col("tf") * (log((lit(1.0) + col("n_docs"))
          / (lit(1.0) + col("df"))) + 1.0), 9).as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
