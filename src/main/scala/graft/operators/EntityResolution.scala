package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution: match a feed of dirty (typo'd) names
  * against a clean registry without an all-pairs distance scan.
  *
  * Candidate generation is SymSpell-style DELETION-NEIGHBORHOOD
  * blocking (Garbe 2012): each name emits itself plus every
  * single-character deletion as block keys; two strings within one
  * edit (insert / delete / substitute) — and, pleasantly, adjacent
  * transpositions, since deleting either swapped character from
  * either side yields the same string — share at least one key.
  * Survivors are re-scored with exact Levenshtein and the best match
  * per dirty record is the deterministic argmin (distance, then
  * lowest registry key).
  *
  * Why not prefix blocking: the registry's names share a long
  * constant prefix (`Customer#0000…`), so any fixed prefix window is
  * ONE giant block — the classic blocking failure on low-entropy
  * keys (shared surnames, constant org prefixes). Deletion keys
  * inherit the full string's entropy instead: block sizes stay O(1)
  * per true match, independent of how the keyspace is skewed toward
  * a common prefix.
  *
  * Scale shape (100 TB): the match runs over DISTINCT names (see
  * [[resolve]]) — mass-identical names collapse to one weighted
  * blocking row before anything explodes, so variant-key fan-out is
  * bounded by how many DISTINCT names sit within one edit of each
  * other (alphabet × length, not row counts). Each side then expands
  * ×(len+1) narrow (key, name) rows and the key join shuffles both
  * sides once; no window, no cross join, no driver state.
  */
object EntityResolution {

  /** The string itself plus every single-character deletion (1-based
    * positions). Duplicate deletions (runs of equal chars) are kept —
    * candidates are de-duplicated at the pair level, which the key
    * join needs to do anyway.
    */
  def deletionKeys(name: Column): Column =
    concat(
      array(name),
      transform(sequence(lit(1), length(name)),
        i => concat(name.substr(lit(1), i - 1),
          name.substr(i + 1, length(name)))))

  /** Resolve `dirty (dirty_id, name)` against `clean (key, name)`:
    * one row per dirty record with its best registry match within
    * `maxDist` (null columns when nothing is close enough) and the
    * count of registry rows that were within `maxDist`.
    *
    * The whole match runs over DISTINCT NAMES: the registry collapses
    * to (name, min key, count) and the feed to its distinct names
    * BEFORE any variant explodes, then results join back to ids. This
    * is what makes mass-duplicate registries (every row "ACME Corp")
    * a non-event: n identical names are ONE blocking row with a
    * weight, so the variant join is ∝ distinct names within one edit
    * — never ∝ row pairs. Identical results by algebra: argmin over
    * (dist, key) ≡ argmin over (dist, min-key-per-name), and the
    * within-maxDist registry count is the weight sum.
    */
  def resolve(dirty: DataFrame, clean: DataFrame, maxDist: Int): DataFrame = {
    val n = dirty.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val dn = dirty.select(col("name").as("d_name")).distinct()
    val cn = clean.groupBy(col("name").as("c_name"))
      .agg(min(col("key")).as("min_key"), count(lit(1)).as("cnt"))
    val dv = dn.select(col("d_name"), explode(deletionKeys(col("d_name"))).as("k"))
    val cv = cn.select(col("c_name"), explode(deletionKeys(col("c_name"))).as("k"))
    // a name pair can collide on several variant keys -> distinct, and
    // the registry's (min_key, cnt) joins back once per surviving pair.
    // PINNED repartitions (PLANS.md #26): the variant frames are a few
    // MB, so AQE coalesces their exchanges to ~1 partition and the
    // ~60×-amplified pair stream plus ~1M codegen Levenshtein DPs run
    // near-single-core (measured 10.0 s; pinned 1.8 s at sf0.1). The
    // d_name pin doubles as lesson 26a: hashpartitioning(d_name)
    // satisfies the best-match groupBy's clustering, so the scored
    // stream aggregates in place.
    val cand = dv.repartition(n, col("k")).join(cv.repartition(n, col("k")), Seq("k"))
      .select("d_name", "c_name")
      .distinct()
      .repartition(n, col("d_name"))
    val scored = cand
      .join(cn, Seq("c_name"))
      .withColumn("dist", levenshtein(col("d_name"), col("c_name")))
      .filter(col("dist") <= maxDist)
    // best match as min over a PACKED LONG, not min(struct) (r16, guide
    // §4 codegen): a struct-typed min has no hash-aggregate buffer, so
    // the best-match groupBy planned as Sort + SortAggregate over the
    // whole scored pair stream (~60× the name count). dist ≤ maxDist
    // (a small int) and registry keys are non-negative and < 10^12
    // (the packing modulus), so min(dist·10^12 + key) is exactly the
    // lexicographic min(struct(dist, key)) — same winner, same
    // tie-break — and the agg runs as a codegen HashAggregate with
    // map-side partials, no sort.
    val Pack = 1000000000000L
    val best = scored.groupBy("d_name").agg(
      min(col("dist").cast("long") * Pack + col("min_key")).as("packed"),
      sum(col("cnt")).as("n_cand"))
    dirty.select(col("dirty_id"), col("name").as("d_name"))
      .join(best, Seq("d_name"), "left")
      .select(col("dirty_id"),
        (col("packed") % Pack).as("matched_key"),
        expr(s"CAST(packed DIV ${Pack}L AS INT)").as("dist"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"))
  }
}
