package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compliance delete propagation into STORED STATE ARTIFACTS (VERDICT
  * r7 #1): purging the raw and derived *layers* (`pipeline_delete_
  * propagate`) is not enough once the engine persists long-lived
  * derived state full of subject ids — minhash/phash/embedding band
  * `members` arrays ([[IncrementalDedup.bandState]]), the
  * digest→canonical map, cluster labels, and IVF assignment lists all
  * outlive the rows they were derived from. A real right-to-be-
  * forgotten purge at 100 TB must rewrite those artifacts too, and the
  * rewrite must be provably equivalent to a full recompute over the
  * purged corpus — otherwise the "purged" state silently diverges from
  * what a from-scratch rebuild would produce and every downstream
  * increment inherits the divergence.
  *
  * Each purge here is incremental in the roster, not the corpus:
  * the roster (~requests-table scale, tiny vs the corpus) broadcasts,
  * and the only non-map-side work is ∝ the AFFECTED slice of the state
  * (bands holding a purged member, digests whose canonical was purged,
  * components containing a purged doc) — never a corpus-wide shuffle.
  * Reference-side analog: the QA discipline of `README.md:121-136`
  * (the reference audits row counts after every staged rewrite).
  *
  * Equivalence contracts (each spec-asserted in StatePurgeSpec and
  * oracle-gated in `pipeline_delete_propagate_state` + the per-artifact
  * gates):
  *  - [[purgeBandState]](bandState(S), R)  == bandState(S \ R)  — given
  *    no band holding a roster member is saturated (a saturated band
  *    dropped its members, so its pre-purge membership is gone; such a
  *    band is a RE-SIGNATURE trigger, the same trigger-don't-silently-
  *    fold pattern as the incremental-clusters cap precondition).
  *  - [[purgeDigestState]](digestState(D), D \ R, R) == digestState(D \ R)
  *    — unconditionally: an unaffected row's canonical survives (it was
  *    the min over a superset), an affected digest re-elects the min
  *    surviving holder, a digest with no surviving holder drops.
  *  - [[purgeClusters]](labels(D), R, pairs) == components(D \ R) —
  *    unconditionally, INCLUDING component splits when the purged doc
  *    was the only bridge: pairs are closed within components, so
  *    re-solving connectivity among each affected component's survivors
  *    with their surviving pairs is exactly the global recompute
  *    restricted to those members; untouched components keep identical
  *    pair sets and labels.
  */
object StatePurge {

  /** Purge a roster of subject ids out of a stored LSH band state
    * `(band, cnt, members: array<struct<doc_id, sigs>>)`: drop purged
    * ids from every member list, recompute `cnt` for unsaturated
    * bands, and drop bands left empty. Saturated bands (`cnt > cap`,
    * members already dropped) pass through unchanged — their
    * membership cannot be reconstructed from the state, so they keep
    * reporting saturated (pairs stay suppressed: a recall loss, never
    * a false dedup) and the caller treats them as re-signature
    * triggers; [[affectedSaturatedBands]] is that trigger's roster.
    *
    * Scale shape: the roster broadcasts into a LEFT ANTI join against
    * the exploded member entries, and the re-aggregation keys on
    * `band` — bucket-local when the state is stored bucketed by band
    * (the [[IncrementalDedup]] storage contract), so nothing crosses
    * the network except the roster itself.
    */
  def purgeBandState(state: DataFrame, roster: DataFrame,
                     cap: Int = Buckets.DefaultCap): DataFrame = {
    val r = broadcast(roster.select(col("id").as("__purge_id")))
    val saturated = state.filter(col("cnt") > cap)
    state.filter(col("cnt") <= cap)
      .select(col("band"), explode(col("members")).as("m"))
      .join(r, col("m.doc_id") === col("__purge_id"), "left_anti")
      .groupBy("band")
      .agg(count(lit(1)).as("cnt"), collect_list(col("m")).as("members"))
      .unionByName(saturated)
  }

  /** The saturated bands that held (or may have held) a roster member:
    * since a saturated band stores no members, membership cannot be
    * checked — EVERY saturated band is conservatively a re-signature
    * trigger after a purge. Kept as its own frame so callers can gate
    * on `isEmpty` (the fixture precondition) or route the bands to a
    * re-signature job (the production path).
    */
  def affectedSaturatedBands(state: DataFrame,
                             cap: Int = Buckets.DefaultCap): DataFrame =
    state.filter(col("cnt") > cap).select(col("band"))

  /** Purge a roster out of a stored exact-dedup digest state
    * `(digest, canonical_id)`, re-electing canonicals from the
    * surviving corpus. `survivorDigests` is the purged corpus as
    * `(doc_id, digest)` — at scale the digest is a stored corpus
    * column (or one map-side md5 pass), and the only shuffle is the
    * re-election groupBy over the AFFECTED digests (∝ roster, after
    * the broadcast semi-join), never the corpus-wide digest shuffle a
    * full `digestState` rebuild pays.
    *
    * Equivalence: rows whose canonical survives are untouched (the
    * stored canonical was min over a superset of the survivors and it
    * survives, so it is still the min); affected digests re-elect
    * `min(doc_id)` over surviving holders; digests with no surviving
    * holder disappear — exactly `digestState(corpus \ roster)`.
    */
  def purgeDigestState(state: DataFrame, survivorDigests: DataFrame,
                       roster: DataFrame): DataFrame = {
    val affected = state
      .join(broadcast(roster.select(col("id").as("canonical_id"))),
        Seq("canonical_id"), "left_semi")
      .select(col("digest"))
    val kept = state.join(broadcast(affected), Seq("digest"), "left_anti")
    val reelected = survivorDigests
      .join(broadcast(affected), Seq("digest"), "left_semi")
      .groupBy("digest").agg(min(col("doc_id")).as("canonical_id"))
    kept.unionByName(reelected.select(col("digest"), col("canonical_id")))
  }

  /** Purge a roster out of stored cluster labels `(id, component)` —
    * DECREMENTAL connected components. Removing a doc removes its
    * pairs, which can SPLIT a component (the purged doc may have been
    * the only bridge), so min-relabeling alone is wrong; the exact
    * maintenance is component-local: components containing a purged
    * member are re-solved from scratch over their SURVIVING members
    * and the pairs among them, while untouched components (identical
    * pair sets) pass through verbatim.
    *
    * `pairsAmong` re-derives near-dup pairs for a given id set (the
    * caller owns the detector; for minhash-LSH that is re-signaturing
    * the survivors — cost ∝ affected docs, not corpus). Its pairs must
    * equal the global detector's pairs restricted to that set, which
    * holds under the same bucket-cap precondition the incremental-
    * clusters gate pins (no band at the cap).
    *
    * Scale shape: the roster and the affected-component list both
    * broadcast; survivors of affected components are ∝ roster × mean
    * cluster size; the re-solve runs on that small graph
    * ([[ConnectedComponents.solveAuto]] — driver union-find at this
    * scale, distributed past the bound). The corpus-sized labels table
    * is touched only by broadcast anti/semi joins.
    */
  def purgeClusters(labels: DataFrame, roster: DataFrame,
                    pairsAmong: DataFrame => DataFrame): DataFrame = {
    val r = broadcast(roster.select(col("id").as("__purge_id")))
    val affected = labels
      .join(r, labels("id") === col("__purge_id"), "left_semi")
      .select(col("component")).distinct()
    val untouched = labels.join(broadcast(affected), Seq("component"), "left_anti")
    val survivors = labels
      .join(broadcast(affected), Seq("component"), "left_semi")
      .join(r, labels("id") === col("__purge_id"), "left_anti")
      .select(col("id"))
    val resolved = ConnectedComponents.solveAuto(survivors, pairsAmong(survivors))
    untouched.select(col("id"), col("component"))
      .unionByName(resolved.select(col("id"), col("component")))
  }
}
