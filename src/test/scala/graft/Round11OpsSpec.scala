package graft

import org.apache.spark.sql.functions._

/** Round-11 ops: compliance purge, deterministic training order,
  * temperature mixing.
  */
class Round11OpsSpec extends SparkSpec {

  test("pipelineDeletePropagate: audit balances, roster fully purged, no leaks") {
    val audit = ExtQueries.pipelineDeletePropagate(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(audit.map(_._1).sorted == Seq("events", "stg_activities"))
    for ((layer, before, after, purged, leaked) <- audit) {
      assert(purged > 0, s"$layer: roster should purge at least one row")
      assert(before - after == purged, s"$layer: audit does not balance")
      assert(leaked == 0L, s"$layer: $leaked purged-subject rows survived")
    }
    // independent re-derivation: the roster's raw event count is exactly
    // what the audit reports purged from the events layer
    val rosterRows = graft.sources.Tables.events(spark, sfSmoke)
      .filter(col("user_id") % 97 === 0).count()
    assert(rosterRows == audit.find(_._1 == "events").get._4)
  }

  test("pipelineShuffleDeterministic: reproducible, shard-balanced, dense positions") {
    val a = ExtQueries.pipelineShuffleDeterministic(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val b = ExtQueries.pipelineShuffleDeterministic(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(a.toSet == b.toSet, "re-running the shuffle must reproduce it exactly")
    assert(a.map(_._1).distinct.length == a.length, "every doc exactly once")
    assert(a.forall(r => r._3 >= 0 && r._3 < 32), "shard out of range")
    // positions within each shard are dense 1..n (a training reader can
    // seek to (shard, pos) with no gaps)
    a.groupBy(_._3).foreach { case (shard, rows) =>
      val ps = rows.map(_._4).sorted.toSeq
      assert(ps == (1L to rows.length.toLong).toSeq,
        s"shard $shard positions not dense")
    }
    // and the order within a shard is the shuffle-key order
    a.groupBy(_._3).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_._4).map(_._2).toSeq
      assert(byPos == byPos.sorted, "pos must follow shuffle_key order")
    }
  }

  test("sampleDiversityQuota: every cell contributes its quota in digest order") {
    val rows = ExtQueries.sampleDiversityQuota(spark, sfSmoke).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.map(_._2).distinct.length == rows.length, "a doc picked twice")
    rows.groupBy(_._1).foreach { case (cid, cell) =>
      val ranks = cell.map(_._4).sorted.toSeq
      assert(ranks == (1L to cell.length.toLong).toSeq,
        s"cell $cid ranks not dense")
      assert(cell.length <= 10, s"cell $cid exceeded its quota")
      // picks really follow the digest order within the cell
      val byRank = cell.sortBy(_._4).map(_._3).toSeq
      assert(byRank == byRank.sorted, s"cell $cid not in digest order")
    }
    // diversity: more than one cell must contribute (the corpus is not
    // one cluster), and re-running reproduces the selection exactly
    assert(rows.map(_._1).distinct.length > 1)
    val again = ExtQueries.sampleDiversityQuota(spark, sfSmoke).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.toSet == again.toSet)
  }

  test("qaSnapshotDrift: ppm shares are exact and the planted drift is flagged") {
    val rows = ExtQueries.qaSnapshotDrift(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
    assert(rows.nonEmpty)
    val totOld = rows.map(_._3).sum
    val totNew = rows.map(_._4).sum
    assert(totNew > totOld, "the new snapshot must include the extra tenth")
    for ((src, lang, nOld, nNew, shOld, shNew, delta, drifted) <- rows) {
      assert(shOld == nOld * 1000000L / totOld, s"$src/$lang share_old wrong")
      assert(shNew == nNew * 1000000L / totNew, s"$src/$lang share_new wrong")
      assert(delta == math.abs(shNew - shOld))
      assert(drifted == (delta > 5000L))
    }
  }

  test("pipelineSplitLeakageSafe: near-dup clusters never straddle splits") {
    val rows = ExtQueries.pipelineSplitLeakageSafe(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
    // every member of a component carries the component's split
    rows.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"component $comp straddles splits")
    }
    // planted near-dups (doc_id + 1000000 copies) that the LSH detector
    // clustered with ANYTHING share their cluster-mates' split — the
    // leakage guarantee (the detector intentionally misses some planted
    // copies; those are singletons and out of scope here)
    val byId = rows.map(r => r._1 -> r._3).toMap
    val clustered = rows.filter(r => r._1 >= 1000000L && r._2 != r._1)
    assert(clustered.nonEmpty, "no planted dup was clustered at all")
    clustered.foreach { case (id, comp, split, _) =>
      assert(byId(comp) == split,
        s"planted dup $id split differs from its canonical $comp")
    }
    // the cluster rule must actually move SOME doc (otherwise the op is
    // indistinguishable from the naive per-doc split on this corpus)
    assert(rows.exists(_._4), "no doc moved — leakage rule untested")
  }

  test("mixTemperature: integer-exact, budget-bounded, flattens the source distribution") {
    val rows = ExtQueries.mixTemperature(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    for ((src, _, nTokens, wSqrt, _, _, _) <- rows)
      assert(wSqrt == math.floor(math.sqrt(nTokens.toDouble)).toLong,
        s"$src: w_sqrt must be the exact integer sqrt")
    // DIV truncation can only under-allocate, never overshoot the budget
    assert(rows.map(_._7).sum <= 1000000L)
    // temperature flattening: the smallest source gains share, the
    // largest loses it (p^(1/2) compresses the distribution)
    val smallest = rows.minBy(_._3)
    val largest = rows.maxBy(_._3)
    assert(smallest._6 >= smallest._5,
      "temperature must upweight the tail source")
    assert(largest._6 <= largest._5,
      "temperature must downweight the head source")
  }

  test("packChunkedSequences: full chunk coverage, bounded bins, honest continuation flags") {
    import spark.implicits._
    val packed = ExtQueries.packChunkedSequences(spark, sfSmoke)
      .select($"doc_id", $"chunk_idx", $"pack_group", $"pack_bin",
        $"n_chunk_words", $"is_continuation")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    // every chunk of every doc packed exactly once
    val chunkKeys = ExtQueries.textChunks(spark, sfSmoke)
      .select($"doc_id", $"chunk_idx").as[(Long, Long)].collect().toSet
    assert(packed.map(r => (r._1, r._2)).toSet == chunkKeys)
    assert(packed.length == chunkKeys.size, "a chunk was packed twice")
    // fractional-packing bound: a bin exceeds the budget by at most one
    // chunk (the same guarantee the doc-level packer documents)
    val maxChunk = packed.map(_._5).max
    packed.groupBy(r => (r._3, r._4)).foreach { case (bin, rows) =>
      val tokens = rows.map(_._5).sum
      assert(tokens < 512 + maxChunk, s"bin $bin overflows: $tokens tokens")
    }
    // continuation flag = exactly the non-first chunks
    assert(packed.forall(r => r._6 == (r._2 > 0)))
    assert(packed.exists(_._6), "fixture has no multi-chunk doc — continuation untested")
  }
}
