package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-batch INCREMENTAL near-duplicate dedup: dedup a NEW batch of
  * documents against STORED corpus state without rescanning — or even
  * re-signaturing — the corpus (the daily-ingest shape of a 100 TB
  * pipeline: yesterday's corpus is petabytes, today's batch is not).
  *
  * The stored state is the AGGREGATED band table of the minhash-LSH
  * detector (`ExtQueries.dedupMinhashLsh`):
  * `(band, cnt, members: array<struct<doc_id, sigs>>)` — one row per
  * band key, carrying every corpus member's 16-slot signature. An
  * increment then needs exactly three things, none of which touch
  * corpus text:
  *  1. signature+band the batch (one `minhash_bands` scan of the batch);
  *  2. join the batch's band groups against the state on `band`;
  *  3. expand new-vs-corpus and new-vs-new pairs inside each band.
  *
  * Scale shape: the state is written BUCKETED BY `band`, so step 2 is a
  * bucket-local join — only the batch's (band → members) groups move
  * (bytes ∝ |batch| × bands), the state is read in place, and corpus
  * pairs are never re-derived. Shuffle and pair volume are both
  * ∝ batch, not ∝ corpus — a full re-run of the LSH detector is
  * ∝ corpus every day.
  *
  * Equivalence contract (the oracle gate): pairs from
  * [[pairsAgainst]] == the full-recompute detector over corpus ∪ batch,
  * restricted to pairs touching the batch. That holds because the
  * bounded-bucket cap (see [[Buckets]]) is evaluated on the TOTAL band
  * membership `corpus cnt + batch cnt` — the state stores the count
  * even where it truncates members (a band past the cap can never
  * produce pairs again: membership only grows), so the cap decision is
  * identical to the one the full recompute makes.
  */
object IncrementalDedup {

  /** Signature slots per doc (matches `minhash_bands(_, 16, 4)`). */
  val K = 16

  /** Build the storable band state from a banded frame
    * `(doc_id, sigs, band)`. State invariant (shared with
    * [[foldState]]): `cnt` = the band's DISTINCT membership while it
    * fits in `cap`, and SATURATES at `cap + 1` once it crosses — the
    * only question any consumer asks is `cnt > cap` (membership only
    * grows, so a saturated band stays saturated), and a saturating
    * counter is what makes re-folding a replayed batch a no-op even
    * for bands whose members were dropped (an exact "rows ever seen"
    * count would double-add on replay and could silently diverge the
    * cap decision from the full-recompute oracle — VERDICT r5 #1).
    * Members of a saturated band are dropped (they can never pair
    * again). Same collect-then-filter shape as
    * [[Buckets.boundedMembers]]; the degenerate-band buffer hazard and
    * its cap rationale live there.
    */
  def bandState(banded: DataFrame, cap: Int = Buckets.DefaultCap): DataFrame =
    banded.groupBy("band")
      .agg(count(lit(1)).as("n"),
        collect_list(struct(col("doc_id"), col("sigs"))).as("members"))
      .select(col("band"),
        when(col("n") > cap, lit(cap + 1L)).otherwise(col("n")).as("cnt"),
        when(col("n") > cap, expr("filter(members, x -> false)"))
          .otherwise(col("members")).as("members"))

  /** First-occurrence-wins dedup of a member list by `doc_id` — the
    * array twin of [[foldDigestState]]'s first-seen-wins coalesce.
    * O(n²) per band but n ≤ 2·cap by construction (both inputs are
    * cap-truncated), and only merged bands pay it.
    */
  private def dedupMembers(m: String): String =
    s"""filter($m, (x, i) ->
       |  array_position(transform($m, y -> y.doc_id), x.doc_id) = i + 1)""".stripMargin

  /** Fold a new batch's banded frame into the state: per band, member
    * lists concatenate FIRST-SEEN-WINS (deduped by `doc_id`, state side
    * first), `cnt` becomes the merged distinct membership, saturating
    * at `cap + 1` where the band ever crossed `cap` (members then
    * drop). REPLAY-IDEMPOTENT by construction:
    * `foldState(foldState(s, b), b) == foldState(s, b)` — a retried
    * daily job re-applying its batch changes nothing, matching
    * [[foldDigestState]]'s semantics (spec-asserted in
    * Round8OpsSpec). Full-outer on `band` — bucket-local when the
    * state is bucketed by band; only the batch side shuffles.
    */
  def foldState(state: DataFrame, banded: DataFrame,
                cap: Int = Buckets.DefaultCap): DataFrame = {
    val nb = bandState(banded, cap)
      .withColumnRenamed("cnt", "new_cnt")
      .withColumnRenamed("members", "new_members")
    state.join(nb, Seq("band"), "full")
      .select(col("band"),
        (coalesce(col("cnt"), lit(0L)) > cap ||
          coalesce(col("new_cnt"), lit(0L)) > cap).as("was_capped"),
        expr(s"""${dedupMembers(
          """CASE WHEN members IS NULL THEN new_members
            |     WHEN new_members IS NULL THEN members
            |     ELSE members || new_members END""".stripMargin)}""").as("m0"))
      .select(col("band"),
        when(col("was_capped") || size(col("m0")) > cap, lit(cap + 1L))
          .otherwise(size(col("m0")).cast("long")).as("cnt"),
        when(col("was_capped") || size(col("m0")) > cap,
          expr("filter(m0, x -> false)")).otherwise(col("m0")).as("members"))
  }

  /** EXACT-dedup state: (digest, canonical_id) — the minimum doc id
    * holding each content digest, 16 bytes + one id per DISTINCT
    * document. The exact sibling of [[bandState]]: a daily ingest
    * dedups against this without touching corpus text (first-seen
    * wins — the stored canonical stays canonical even when a later
    * batch id sorts lower, because published corpus rows are
    * immutable).
    */
  def digestState(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text").cast("binary")).as("digest"))
      .groupBy("digest").agg(min(col("doc_id")).as("canonical_id"))

  /** Fold a batch into the digest state: existing digests keep their
    * canonical (first-seen wins), new digests adopt the batch minimum.
    * Full-outer on digest — bucket-local when the state is bucketed.
    */
  def foldDigestState(state: DataFrame, batch: DataFrame): DataFrame =
    state.join(
        digestState(batch).withColumnRenamed("canonical_id", "batch_min"),
        Seq("digest"), "full")
      .select(col("digest"),
        coalesce(col("canonical_id"), col("batch_min")).as("canonical_id"))

  /** Exact-dedup verdict for every batch doc against the stored digest
    * state: `canonical` (first holder of a new digest), `dup_corpus`
    * (digest already stored), or `dup_batch` (digest new but another
    * batch doc holds the minimum). One digest shuffle of the batch +
    * one join against the state — corpus text never moves.
    */
  def exactAgainst(state: DataFrame, batch: DataFrame): DataFrame = {
    val b = batch.select(col("doc_id"), md5(col("text").cast("binary")).as("digest"))
    val bm = b.groupBy("digest").agg(min(col("doc_id")).as("batch_min"))
    b.join(bm, "digest")
      .join(state.withColumnRenamed("canonical_id", "corpus_canonical"),
        Seq("digest"), "left")
      .select(col("doc_id"),
        coalesce(col("corpus_canonical"), col("batch_min")).as("canonical_id"),
        col("corpus_canonical"), col("batch_min"))
      .select(col("doc_id"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("keep"),
        when(col("doc_id") === col("canonical_id"), "canonical")
          .when(col("corpus_canonical").isNotNull, "dup_corpus")
          .otherwise("dup_batch").as("status"))
  }

  /** INCREMENTAL CLUSTER MAINTENANCE: fold a batch's near-dup pairs
    * into stored component labels without re-clustering the corpus.
    * Standard quotient-graph argument: stored labels contract
    * yesterday's components to single nodes; the new (batch-touching)
    * pairs lifted to those component endpoints form a SMALL quotient
    * graph (∝ new pairs); its exact components give a relabel mapping.
    * Because stored labels are component MINIMA, the solved quotient
    * label is min over member minima = the global minimum of each
    * merged component — exactly what a full recompute over
    * corpus ∪ batch produces (the oracle gate states that equality).
    *
    * Scale shape: new pairs ∝ batch (the [[pairsAgainst]] path), the
    * quotient solve runs on a graph ∝ new pairs (not ∝ corpus), and
    * the corpus-sized labels table is touched by ONE broadcast join
    * of the tiny mapping — no corpus shuffle, no propagation rounds
    * over the corpus. A full re-cluster pays diameter-many
    * corpus-wide rounds every day.
    *
    * @param labels   stored (id, component) — component = minimum id,
    *                 CONVERGED (the [[ConnectedComponents.runStar]]
    *                 output contract)
    * @param newIds   batch vertex ids, column `id`
    * @param newPairs batch-touching pairs (doc_id_1, doc_id_2, …)
    * @return (doc_id, component, keep) over corpus ∪ batch
    */
  def mergeClusters(labels: DataFrame, newIds: DataFrame,
                    newPairs: DataFrame): DataFrame = {
    // lift pair endpoints to quotient nodes: corpus ids → their stored
    // component, batch ids → themselves
    // PERSISTED for the solve (r16 measure-first finding): the
    // quotient-vertex distinct-collect and the solver's own edge
    // materializations each referenced `lifted` separately — uncached,
    // each re-ran the whole batch-pair derivation (pairsAgainst's
    // banding + bucket expansion; 1.4 s of repeated work at sf0.1).
    // Bounded ∝ batch pairs; released in the finally — `solved` comes
    // back with no lineage into it (driver union-find returns a local
    // frame, the runStar fallback checkpoints).
    val lifted = (newPairs
      .join(labels.select(col("id").as("doc_id_1"), col("component").as("comp_1")),
        Seq("doc_id_1"), "left")
      .join(labels.select(col("id").as("doc_id_2"), col("component").as("comp_2")),
        Seq("doc_id_2"), "left")
      .select(coalesce(col("comp_1"), col("doc_id_1")).as("src"),
        coalesce(col("comp_2"), col("doc_id_2")).as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val solved = try {
      val qverts = lifted.select(col("src").as("id"))
        .unionByName(lifted.select(col("dst").as("id"))).distinct()
      // exact components of the quotient graph (merge chains can be long
      // — A—batch—B—batch'—C — so an any-diameter solve; solveAuto takes
      // the bounded driver union-find when the graph is small, which the
      // ∝-batch quotient graph is by construction, and falls back to the
      // distributed runStar past the bound)
      ConnectedComponents.solveAuto(qverts, lifted)
    } finally { lifted.unpersist(); () }
    val mapping = solved.filter(col("id") =!= col("component"))
      .select(col("id").as("old_component"), col("component").as("new_component"))
    val relabeled = labels
      .join(mapping, labels("component") === mapping("old_component"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("new_component"), col("component")).as("component"))
    val batchLabels = newIds
      .join(solved.withColumnRenamed("component", "new_component"), Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("new_component"), col("id")).as("component"))
    relabeled.unionByName(batchLabels)
      .select(col("doc_id"), col("component"),
        (col("doc_id") === col("component")).as("keep"))
  }

  /** [[pairsAgainst]]'s PERCEPTUAL-HASH sibling: the stored state is
    * the same `(band, cnt, members)` shape with a 64-char aHash bit
    * string as the member payload (`sigs`), bands are the 4×16-bit
    * hash blocks, and verification is exact hamming ≤ `maxHamming`
    * instead of a signature-Jaccard estimate. Same equivalence
    * contract: the [2, cap] filter runs on TOTAL membership, so pairs
    * equal the full block-LSH detector over corpus ∪ batch restricted
    * to batch-touching pairs (a corpus band saturated past the cap
    * stores cnt = cap+1 and forces total > cap exactly like the
    * full detector's own bucket cap).
    */
  def phashPairsAgainst(state: DataFrame, batchBanded: DataFrame,
                        maxHamming: Int = 3,
                        cap: Int = Buckets.DefaultCap): DataFrame = {
    val nb = batchBanded.groupBy("band")
      .agg(count(lit(1)).as("new_cnt"),
        collect_list(struct(col("doc_id"), col("sigs"))).as("new_members"))
    val ham = (a: String, b: String) =>
      s"64 - size(filter(sequence(1, 64), i -> substring($a.sigs, i, 1) = substring($b.sigs, i, 1)))"
    nb.join(state, Seq("band"), "left")
      .filter((col("new_cnt") + coalesce(col("cnt"), lit(0L))).between(2, cap))
      .select(col("new_members"),
        coalesce(col("members"), expr("filter(new_members, x -> false)"))
          .as("old_members"))
      .select(explode(expr(
        s"""concat(
           |  flatten(transform(new_members, a ->
           |    transform(old_members, b ->
           |      struct(least(a.doc_id, b.doc_id) AS doc_id_1,
           |             greatest(a.doc_id, b.doc_id) AS doc_id_2,
           |             CAST(${ham("a", "b")} AS BIGINT) AS hamming)))),
           |  flatten(transform(new_members, a ->
           |    transform(filter(new_members, b -> b.doc_id > a.doc_id), b ->
           |      struct(a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
           |             CAST(${ham("a", "b")} AS BIGINT) AS hamming)))))""".stripMargin)).as("p"))
      .select(col("p.doc_id_1"), col("p.doc_id_2"), col("p.hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** [[pairsAgainst]]'s EMBEDDING sibling — the third modality of the
    * same stored-band-state shape: the state is `(band, cnt, members)`
    * with the VECTOR ITSELF as the member payload (`sigs` =
    * array<double>, exactly as the one-shot detector's buckets carry
    * it), bands are the hyperplane-LSH blocks, and verification is
    * exact cosine ≥ `threshold` computed in-band — no corpus fetch on
    * the verify step, because the candidates' vectors are already in
    * the state row. Same equivalence contract as the minhash/phash
    * twins: the [2, cap] filter runs on TOTAL membership, so pairs
    * equal `Similarity.nearDupPairs` over corpus ∪ batch restricted
    * to batch-touching pairs.
    *
    * State footprint: members × dim doubles per band — heavier per
    * member than a 16-slot signature, but identical to what the
    * one-shot detector's bucket rows hold, and bounded by cap × dim
    * per band row.
    */
  def cosinePairsAgainst(state: DataFrame, batchBanded: DataFrame,
                         threshold: Double = 0.95,
                         cap: Int = Buckets.DefaultCap): DataFrame = {
    val nb = batchBanded.groupBy("band")
      .agg(count(lit(1)).as("new_cnt"),
        collect_list(struct(col("doc_id"), col("sigs"))).as("new_members"))
    val cos = (a: String, b: String) => s"cosine_sim($a.sigs, $b.sigs)"
    nb.join(state, Seq("band"), "left")
      .filter((col("new_cnt") + coalesce(col("cnt"), lit(0L))).between(2, cap))
      .select(col("new_members"),
        coalesce(col("members"), expr("filter(new_members, x -> false)"))
          .as("old_members"))
      .select(explode(expr(
        s"""concat(
           |  flatten(transform(new_members, a ->
           |    transform(old_members, b ->
           |      struct(least(a.doc_id, b.doc_id) AS id_1,
           |             greatest(a.doc_id, b.doc_id) AS id_2,
           |             ${cos("a", "b")} AS cos)))),
           |  flatten(transform(new_members, a ->
           |    transform(filter(new_members, b -> b.doc_id > a.doc_id), b ->
           |      struct(a.doc_id AS id_1, b.doc_id AS id_2,
           |             ${cos("a", "b")} AS cos)))))""".stripMargin)).as("p"))
      .select(col("p.id_1"), col("p.id_2"), col("p.cos"))
      .distinct()
      .filter(col("cos") >= threshold)
      .select(col("id_1"), col("id_2"), round(col("cos"), 6).as("cosine"))
  }

  /** Near-dup pairs of a new batch against the stored state: every
    * (new, corpus) and (new, new) pair sharing a band whose TOTAL
    * membership is within [2, cap], signature-Jaccard estimated and
    * thresholded exactly like the full-recompute detector. Corpus-vs-
    * corpus pairs are never generated (they were yesterday's output).
    *
    * `doc_id_1 < doc_id_2` orientation via least/greatest — a batch id
    * may sort on either side of a corpus id, and the full-recompute
    * oracle orders pairs by id, not by batch membership.
    */
  def pairsAgainst(state: DataFrame, batchBanded: DataFrame,
                   minEst: Double = 0.4,
                   cap: Int = Buckets.DefaultCap): DataFrame = {
    val nb = batchBanded.groupBy("band")
      .agg(count(lit(1)).as("new_cnt"),
        collect_list(struct(col("doc_id"), col("sigs"))).as("new_members"))
    val est = (a: String, b: String) =>
      s"CAST(size(filter(zip_with($a.sigs, $b.sigs, (x, y) -> x = y), p -> p)) AS DOUBLE) / $K"
    // left join: bands absent from the state still pair new-vs-new.
    // The state side never shuffles when bucketed by band; on an
    // unbucketed state AQE broadcasts the (small) batch aggregate.
    nb.join(state, Seq("band"), "left")
      .filter((col("new_cnt") + coalesce(col("cnt"), lit(0L))).between(2, cap))
      .select(col("new_members"),
        coalesce(col("members"), expr("filter(new_members, x -> false)"))
          .as("old_members"))
      .select(explode(expr(
        s"""concat(
           |  flatten(transform(new_members, a ->
           |    transform(old_members, b ->
           |      struct(least(a.doc_id, b.doc_id) AS doc_id_1,
           |             greatest(a.doc_id, b.doc_id) AS doc_id_2,
           |             ${est("a", "b")} AS est_jaccard)))),
           |  flatten(transform(new_members, a ->
           |    transform(filter(new_members, b -> b.doc_id > a.doc_id), b ->
           |      struct(a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
           |             ${est("a", "b")} AS est_jaccard)))))""".stripMargin)).as("p"))
      .select(col("p.doc_id_1"), col("p.doc_id_2"), col("p.est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= minEst)
  }
}
