package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.LatestPerKey
import graft.sources.Tables

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
}
