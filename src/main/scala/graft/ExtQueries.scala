package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{LatestPerKey, Multimodal, Similarity}
import graft.sources.Tables
import graft.streaming.StreamingStage

/** Spark-side implementations of the LLM-data-pipeline extension queries
  * (dedup, text analysis) over the `documents` table. Each has a DuckDB
  * oracle (see SparkEntry) unless the primitive isn't SQL-portable.
  *
  * Since the synthetic corpus has no duplicates, dedup queries first build
  * a deterministic augmented corpus: every 10th doc re-appears with
  * `doc_id + 1000000` — exact copy for exact dedup, first-5-words-dropped
  * copy for near-dup — so the operators demonstrably remove rows.
  */
object ExtQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Corpus + exact duplicate copies of every 10th doc. */
  private def withExactDups(d: DataFrame): DataFrame =
    d.select("doc_id", "text", "lang", "source", "n_chars").unionByName(
      d.filter(col("doc_id") % 10 === 0).select(
        (col("doc_id") + lit(1000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars")))

  /** Exact deduplication: hash-partition by content fingerprint, keep the
    * lowest id. At scale this shuffles 16-byte digests, not documents —
    * the md5 (not raw text) partition key is the 100 TB design choice.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    LatestPerKey(
      withExactDups(docs(s, dir)),
      Seq(md5(col("text").cast("binary"))),
      Seq(col("doc_id").asc_nulls_first))
      .select("doc_id", "lang", "source", "n_chars")

  /** Word 3-gram shingle set per doc (guarded for short docs). */
  private val shingleExpr =
    """CASE WHEN size(words) < 3 THEN CAST(array() AS ARRAY<STRING>)
      |     ELSE transform(sequence(1, size(words) - 2),
      |                    i -> array_join(slice(words, i, 3), ' ')) END""".stripMargin

  /** N-gram Jaccard near-duplicate pairs: shingle → inverted index →
    * shared-shingle counts → Jaccard ≥ 0.5. The posting-list self-join is
    * the scalable formulation (no O(n²) document cross join); rare word
    * 3-grams keep posting lists short.
    */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), split(col("text"), " ").as("words"))
    val pert = base.filter(col("doc_id") % 10 === 0).select(
      (col("doc_id") + lit(1000000L)).as("doc_id"),
      expr("slice(words, 6, greatest(size(words) - 5, 0))").as("words"))
    val all = base.unionByName(pert)
    val sh = all
      .withColumn("sh", explode(array_distinct(expr(shingleExpr))))
      .select("doc_id", "sh")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_id_1").withColumnRenamed("n_sh", "n1"), "doc_id_1")
      .join(sizes.withColumnRenamed("doc_id", "doc_id_2").withColumnRenamed("n_sh", "n2"), "doc_id_2")
      .withColumn("jaccard", col("inter") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select("doc_id_1", "doc_id_2", "jaccard")
  }

  /** Token + char counting (whitespace tokenizer). */
  def textTokenCount(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars_computed"))

  /** Quality scoring: character-class ratios + mean token length. */
  def textQualityScore(s: SparkSession, dir: String): DataFrame = {
    val len = length(col("text")).cast("double")
    val alpha = length(regexp_replace(col("text"), "[^a-z]", "")).cast("double")
    val spaces = length(col("text")) - length(regexp_replace(col("text"), " ", ""))
    docs(s, dir).select(
      col("doc_id"),
      (alpha / len).as("alpha_ratio"),
      (spaces.cast("double") / len).as("ws_ratio"),
      ((len - spaces.cast("double")) / (spaces.cast("double") + lit(1.0))).as("avg_token_len"))
  }

  /** Stopword-lexicon language id: tokenize → lexicon hit counts per lang →
    * argmax (ties broken by lang name). The lexicon is tiny → broadcast.
    */
  val langLexicon: Seq[(String, String)] = Seq(
    "the" -> "en", "order" -> "en", "window" -> "en", "table" -> "en",
    "slow" -> "es", "agg" -> "es", "vector" -> "es", "merge" -> "es",
    "customer" -> "de", "join" -> "de", "column" -> "de", "key" -> "de",
    "scan" -> "fr", "data" -> "fr", "query" -> "fr", "batch" -> "fr",
    "row" -> "zh", "small" -> "zh", "value" -> "zh", "line" -> "zh")

  def textLangId(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val lex = langLexicon.toDF("word", "lex_lang")
    val d = docs(s, dir)
    val hits = d.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(lex), "word")
      .groupBy("doc_id", "lex_lang")
      .agg(count(lit(1)).as("hits"))
    val best = LatestPerKey(hits, Seq(col("doc_id")),
      Seq(col("hits").desc_nulls_last, col("lex_lang").asc_nulls_first))
      .select(col("doc_id"), col("lex_lang"))
    d.select(col("doc_id"), col("lang").as("actual_lang"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("actual_lang"),
        coalesce(col("lex_lang"), lit("und")).as("predicted_lang"))
  }

  /** Content fingerprint (md5 of normalized text) — portable digest. */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      md5(lower(col("text")).cast("binary")).as("fingerprint"))

  /** Corpus + near-duplicate copies (first 5 words dropped) of every 10th
    * doc, as (doc_id, words) — shared input for the near-dup detectors.
    */
  private def withNearDups(d: DataFrame): DataFrame = {
    val base = d.select(col("doc_id"), split(col("text"), " ").as("words"))
    base.unionByName(base.filter(col("doc_id") % 10 === 0).select(
      (col("doc_id") + lit(1000000L)).as("doc_id"),
      expr("slice(words, 6, greatest(size(words) - 5, 0))").as("words")))
  }

  /** MinHash + LSH near-dup detection: 16-slot signature, 4 bands × 4
    * rows, candidates = docs sharing a band key, kept when the signature
    * Jaccard estimate ≥ 0.4. The whole signature+banding stage is
    * per-row HOF work (one scan, no explode of shingles); only the tiny
    * (doc_id, band) pairs shuffle — that's the 100 TB shape: bytes across
    * the wire ∝ docs × bands, not docs × shingles.
    */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val k = 16; val bands = 4; val rows = 4
    val sig = withNearDups(docs(s, dir))
      .withColumn("sh", TextFunctions.shingles(col("words"), 3))
      .filter(size(col("sh")) > 0)
      .withColumn("sigs", TextFunctions.minhashSignature(array_distinct(col("sh")), k))
      .select(col("doc_id"), col("sigs"),
        TextFunctions.lshBands(col("sigs"), bands, rows).as("bandkeys"))
    val banded = sig.select(col("doc_id"), col("sigs"), explode(col("bandkeys")).as("band"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"),
        TextFunctions.signatureSimilarity(col("a.sigs"), col("b.sigs"), k).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= 0.4)
  }

  /** SimHash near-dup detection: 16-bit simhash per doc (single-pass HOF,
    * no shuffle), candidate pairs bucketed by the 8-bit prefix, kept when
    * hamming ≤ 3. Prefix bucketing is the standard hamming-space block
    * trick: a pair within distance d shares at least one of d+1 equal
    * blocks, so few-bit-different docs collide with high probability.
    */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val sim = withNearDups(docs(s, dir))
      .select(col("doc_id"), TextFunctions.simhash16(col("words")).as("simhash"))
      .withColumn("bucket", col("simhash").substr(1, 8))
    sim.as("a").join(sim.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"),
        col("a.simhash").as("simhash_1"),
        TextFunctions.hammingDistance(col("a.simhash"), col("b.simhash"), 16).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
  }

  /** Polynomial rolling-hash fingerprint per document. */
  def textRollingFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      TextFunctions.rollingHash(col("text")).as("rhash"))

  /** BPE-flavored tokenization stats (letter/digit/punct token runs). */
  def textBpeTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      size(TextFunctions.bpeTokens(col("text"))).cast("long").as("n_bpe_tokens"),
      size(array_distinct(TextFunctions.bpeTokens(col("text")))).cast("long").as("n_distinct_tokens"))

  // ===== embedding similarity =====

  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Every 25th vector is a query; exact brute-force cosine top-5. */
  def simCosineTopK(s: SparkSession, dir: String): DataFrame = {
    val all = vecs(s, dir)
    Similarity.bruteForceTopK(all, all.filter(col("vec_id") % 25 === 0), k = 5)
  }

  /** Same query set through the hyperplane-LSH bucketed (approximate)
    * path — the scale formulation: candidates shrink to the query's
    * bucket, so the scan is corpus-size, not corpus × queries.
    */
  def simAnnLshTopK(s: SparkSession, dir: String): DataFrame = {
    val all = vecs(s, dir)
    Similarity.lshTopK(all, all.filter(col("vec_id") % 25 === 0), k = 5, nBits = 8)
  }

  /** Embedding near-dup: every 10th vector re-appears deterministically
    * perturbed (index-patterned additive noise — cosine is scale-invariant
    * so a multiplicative copy would be a degenerate test); pairs with
    * cosine ≥ 0.95 among LSH-bucket candidates survive.
    */
  def dedupEmbeddingCosine(s: SparkSession, dir: String): DataFrame = {
    val base = vecs(s, dir).select(col("vec_id"), col("embedding"))
    val pert = base.filter(col("vec_id") % 10 === 0).select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(sequence(lit(1), size(col("embedding"))),
        i => element_at(col("embedding"), i).cast("double") +
          (i % 5 - 2).cast("double") * 0.01).as("embedding"))
    val all = base.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("embedding")).unionByName(pert)
    Similarity.nearDupPairs(all, threshold = 0.95, nBits = 8)
  }

  // ===== multimodal & streaming =====

  /** Binary-payload feature extraction (stubbed decode — see Multimodal). */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.documentFeatures(docs(s, dir))

  /** Streaming (AvailableNow) hourly window agg — must equal the batch
    * `events_hourly_agg` result exactly.
    */
  def streamingHourlyAgg(s: SparkSession, dir: String): DataFrame =
    StreamingStage.streamingHourlyAgg(s, dir)

  /** Streaming dedup of a duplicated stream — must equal the base table. */
  def streamingDedupEvents(s: SparkSession, dir: String): DataFrame =
    StreamingStage.streamingDedupEvents(s, dir)
}
