package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1-equivalent scale smoke for the sketch-dedup family (VERDICT r01
  * item 9): synthesize a 10× documents corpus from sf0.1 (each copy gets
  * a distinct suffix token and shifted doc_id, so copies of one doc are
  * near-duplicates of each other — a dedup-shaped workload, not just
  * bigger bytes), run E2/E3/E4 once, and record wall time plus per-task
  * byte skew. The balance gate: max task bytes ≤ 2× median — proving
  * the Buckets cap keeps the bucket-expansion stage balanced when every
  * doc has 9 near-identical twins colliding in its buckets.
  *
  * Usage: `sbt "runMain graft.ScaleSmoke [workDir]"` — prints one
  * markdown table (captured into SCALE_SMOKE.md).
  */
object ScaleSmoke {

  /** Shuffle-read bytes per reducer task, keyed by stage — the balance
    * signal for the bucket-expansion stages. Scan tasks are excluded
    * (sized by file layout, not key skew), and ratios are computed
    * WITHIN a stage: AQE deliberately varies task sizes ACROSS stages
    * (coalescing toward its advisory size), so a cross-stage max/median
    * reads as skew when none exists.
    */
  private final class TaskBytes extends SparkListener {
    val byStage = scala.collection.mutable.Map[Int, scala.collection.mutable.ArrayBuffer[Long]]()
    val stageNames = scala.collection.mutable.Map[Int, String]()
    override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      synchronized {
        val scopes = e.stageInfo.rddInfos
          .flatMap(_.scope.map(_.name)).distinct.mkString(" | ")
        stageNames(e.stageInfo.stageId) =
          s"${e.stageInfo.name} [$scopes]"
      }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      val m = e.taskMetrics
      if (m != null && m.shuffleReadMetrics.totalBytesRead > 0)
        byStage.getOrElseUpdate(e.stageId, scala.collection.mutable.ArrayBuffer[Long]()) +=
          m.shuffleReadMetrics.totalBytesRead
    }
    /** (worst within-stage max/median ratio, that stage's median MB, max MB, n tasks). */
    def worstStage: (Double, Double, Double, Int) = synchronized {
      val stats = byStage.values.filter(_.size >= 4).map { b =>
        val s = b.sorted
        val med = s(s.size / 2).max(1L)
        (s.last.toDouble / med, med / 1e6, s.last / 1e6, s.size)
      }
      if (stats.isEmpty) (0.0, 0.0, 0.0, 0) else stats.maxBy(_._1)
    }
    /** Diagnostic line naming the worst stage (stderr, not the table):
      * without it a 2.0× ratio points at NO specific stage and the
      * r12→r13 "fix the propagation join" detour happens — the salted
      * join changed nothing because the offender was another stage.
      */
    def worstStageDetail: String = synchronized {
      val stats = byStage.toSeq.filter(_._2.size >= 4).map { case (sid, b) =>
        val s = b.sorted
        val med = s(s.size / 2).max(1L)
        (s.last.toDouble / med, sid)
      }
      if (stats.isEmpty) "no shuffle stage >= 4 tasks"
      else {
        val (ratio, sid) = stats.maxBy(_._1)
        f"stage $sid ratio $ratio%.2f: ${stageNames.getOrElse(sid, "?")}"
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft_scale")
    val copies = 10
    val spark = Sessions.local("graft-scale-smoke")

    val base = sources.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    (0 until copies).map { c =>
      base.select(
        (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
        concat(col("text"), lit(s" copytoken$c")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_.unionByName(_))
      .repartition(32) // scan parallelism at read time
      .write.mode("overwrite").parquet(s"$work/documents.parquet")

    // 10× embeddings: each copy is the base vector nudged by a per-copy
    // constant, so the 10 copies of one vector are mutual near-dups that
    // collide in the same LSH band buckets — the hot-bucket workload the
    // Buckets cap must keep balanced
    val emb = sources.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    (0 until copies).map { c =>
      emb.select(
        (col("vec_id") + lit(c * 10000000L)).as("vec_id"),
        transform(col("embedding"), x => x + lit(c * 0.001f)).as("embedding"))
    }.reduce(_.unionByName(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")

    // round 7: the PRODUCTION shape of the incremental query — the band
    // state is PRE-STORED (built once, the daily amortized cost), so the
    // timed query is batch-signature + state join + pair expansion only.
    // The inline gate (`pipeline_dedup_incremental`) rebuilds the state
    // per run, which is the equivalence harness, not the deployed plan.
    val storedStatePath = s"$work/band_state.parquet"
    graft.operators.IncrementalDedup.bandState(
        ExtQueries.minhashBanded(
          ExtQueries.withNearDups(ExtQueries.docs(spark, work))
            .filter(col("doc_id") % 7 =!= 0)))
      .write.mode("overwrite").parquet(storedStatePath)
    def dedupIncrementalVsStored(s: SparkSession, dir: String) = {
      val batch = ExtQueries.withNearDups(ExtQueries.docs(s, dir))
        .filter(col("doc_id") % 7 === 0)
      graft.operators.IncrementalDedup.pairsAgainst(
        s.read.parquet(storedStatePath), ExtQueries.minhashBanded(batch))
    }

    // round 9: the production shape of CLUSTER maintenance — the gate
    // query (`pipeline_dedup_incremental_clusters`) rebuilds
    // yesterday's labels inline (the equivalence harness must derive
    // them from the oracle's inputs), which the honest eager timing now
    // reveals costs MORE than a full re-cluster at this scale; the
    // deployed plan reads the stored labels + band state and pays only
    // pairs-∝-batch + the quotient solve
    val storedLabelsPath = s"$work/labels0.parquet"
    locally {
      val corpus = ExtQueries.withNearDups(ExtQueries.docs(spark, work))
        .filter(col("doc_id") % 7 =!= 0)
      val corpusBanded = ExtQueries.minhashBanded(corpus)
      val corpusPairs = graft.operators.IncrementalDedup.pairsAgainst(
        graft.operators.IncrementalDedup.bandState(corpusBanded.limit(0)), corpusBanded)
      graft.operators.ConnectedComponents.runStar(
          corpus.select(col("doc_id").as("id")),
          corpusPairs.select(col("doc_id_1").as("src"), col("doc_id_2").as("dst")))
        .write.mode("overwrite").parquet(storedLabelsPath)
    }
    def dedupClustersIncrementalVsStored(s: SparkSession, dir: String) = {
      val nd = ExtQueries.withNearDups(ExtQueries.docs(s, dir))
      val isBatch = col("doc_id") % 7 === 0
      val newPairs = graft.operators.IncrementalDedup.pairsAgainst(
        s.read.parquet(storedStatePath), ExtQueries.minhashBanded(nd.filter(isBatch)))
      graft.operators.IncrementalDedup.mergeClusters(
        s.read.parquet(storedLabelsPath),
        nd.filter(isBatch).select(col("doc_id").as("id")), newPairs)
    }

    // round 9: incremental IVF at 10× scale — the stored index (corpus
    // split, %7 != 0) is PRE-BUILT like the band state above (the
    // offline amortized cost); the timed query is batch assignment
    // against the frozen stored centroids + bucketed append + probe
    // query. Cost must track the batch where the inline gate
    // (`sim_ivf_append_topk`, which rebuilds per run) tracks the corpus.
    val ivfTblSmoke = "graft_smoke_ivf"
    spark.sql(s"DROP TABLE IF EXISTS $ivfTblSmoke")
    val embAll = spark.read.parquet(s"$work/embeddings.parquet")
    val storedIvf = graft.operators.IvfIndex.build(spark,
      embAll.filter(col("vec_id") % 7 =!= 0), k = 8, iterations = 3,
      ivfTblSmoke, s"$work/ivf_index")
    val smokeGen = new java.util.concurrent.atomic.AtomicInteger(0)
    // MAINTENANCE-only pair (the query path is identical on both sides
    // and dominates an end-to-end timing, hiding the difference): the
    // daily fold = assign batch against frozen stored centroids + one
    // bucketed append; the rebuild it replaces = 3 Lloyd iterations
    // over the full corpus + reassign + rewrite everything. Both close
    // with the same cheap drift aggregate.
    def simIvfAppendMaint(s: SparkSession, dir: String) = {
      graft.operators.IvfIndex.append(s, storedIvf,
        embAll.filter(col("vec_id") % 7 === 0), gen = smokeGen.incrementAndGet())
      graft.operators.IvfIndex.drift(s.table(ivfTblSmoke))
    }
    def simIvfRebuildMaint(s: SparkSession, dir: String) = {
      val n = smokeGen.incrementAndGet()
      val tbl = s"graft_smoke_ivf_rebuild_$n"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      val st = graft.operators.IvfIndex.build(s, embAll, k = 8, iterations = 3,
        tbl, s"$work/ivf_rebuild_$n")
      graft.operators.IvfIndex.drift(s.table(st.listsTable))
    }

    // r14 (VERDICT r8 #1): stored-graph maintenance at 10× edge volume.
    // The base customer↔supplier graph (sf0.1: ~1.2M symmetric edges)
    // replicates into 10 disjoint node namespaces; copies 0-8 play
    // yesterday's corpus (stored artifact pre-built, the offline
    // amortized cost), copy 9 is today's edge batch. The timed pair is
    // the daily fold (batch anti-join — stored side bucket-local since
    // the bucketed src satisfies the (src,dst) join's distribution —
    // + spine fold ∝ batch + append write ∝ batch) vs the rebuild it
    // replaces (distinct + full bucketed rewrite + spine re-aggregate
    // over 10×|E|); the query path over the stored artifact is timed
    // alongside.
    // The 10× RAW inputs (shifted key namespaces, disjoint graphs) —
    // the rebuild must pay the raw orders⋈lineitem derivation a
    // production rebuild pays; a rebuild timed off pre-derived edges
    // would hide exactly the cost the stored artifact exists to
    // amortize (measured: such a rebuild "wins", 3.8 s vs 4.3 s).
    val graphRaw = s"$work/graph_raw"
    // FULL-WIDTH raw copies (all columns, keys shifted): the raw:artifact
    // byte ratio is what the stored pattern amortizes — a skinny
    // keys-only fixture would make "re-derive from raw" artificially as
    // cheap as reading the artifact (measured: rebuild 9.5 s ≈ append
    // 10.5 s on 2-column raws), which no production corpus looks like
    locally {
      val orders = sources.Tables.load(spark, "/root/testdata/sf0.1", "orders")
      val lineitem = sources.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
      (0 until copies).map { c =>
        orders
          .withColumn("o_orderkey", col("o_orderkey") + lit(c * 1000000000L))
          .withColumn("o_custkey", col("o_custkey") + lit(c * 100000000L))
      }.reduce(_.unionByName(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$graphRaw/orders.parquet")
      (0 until copies).map { c =>
        lineitem
          .withColumn("l_orderkey", col("l_orderkey") + lit(c * 1000000000L))
          .withColumn("l_suppkey", col("l_suppkey") + lit(c * 100000000L))
      }.reduce(_.unionByName(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$graphRaw/lineitem.parquet")
    }
    // BOTH raw sides filter to the requested day-range — today's
    // lineitems live in today's ingest partition, so a batch
    // derivation scans batch-sized raw data, not the full history
    def derive10(s: SparkSession, lo: Long, hi: Long) = {
      val cs = s.read.parquet(s"$graphRaw/orders.parquet")
        .filter(col("o_orderkey") >= lo && col("o_orderkey") < hi)
        .join(s.read.parquet(s"$graphRaw/lineitem.parquet")
          .filter(col("l_orderkey") >= lo && col("l_orderkey") < hi),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("a"),
          concat(lit("s"), col("l_suppkey")).as("b")).distinct()
      cs.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(cs.select(col("b").as("src"), col("a").as("dst")))
    }
    // copies 0-8 are yesterday's corpus; copy 9 (orderkey ≥ 9e9) is today
    val graphTblSmoke = "graft_smoke_graph"
    spark.sql(s"DROP TABLE IF EXISTS $graphTblSmoke")
    val storedGraph = graft.operators.GraphIndex.build(spark,
      derive10(spark, 0L, 9000000000L), graphTblSmoke, s"$work/graph_index")
    val graphGen = new java.util.concurrent.atomic.AtomicInteger(0)
    def graphAppendMaint(s: SparkSession, dir: String) = {
      val (next, _) = graft.operators.GraphIndex.append(s, storedGraph,
        derive10(s, 9000000000L, Long.MaxValue), gen = graphGen.incrementAndGet())
      s.read.parquet(next.spinePath)
        .agg(count(lit(1)).as("n_nodes"), sum("out_deg").as("n_edges"))
    }
    def graphRebuildMaint(s: SparkSession, dir: String) = {
      val n = graphGen.incrementAndGet()
      val tbl = s"graft_smoke_graph_rebuild_$n"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      val st = graft.operators.GraphIndex.build(s, derive10(s, 0L, Long.MaxValue),
        tbl, s"$work/graph_rebuild_$n")
      s.read.parquet(st.spinePath)
        .agg(count(lit(1)).as("n_nodes"), sum("out_deg").as("n_edges"))
    }
    def graphRanksStored(s: SparkSession, dir: String) =
      graft.operators.GraphIndex.ranks(s, storedGraph, iterations = 3)

    // driver r8 (VERDICT r7 #4): ADVERSARIAL fixtures for the r7
    // curation ops, in a sibling dir so the historical 10× rows keep
    // their fixture unchanged.
    //  - events: 10 copies (distinct event_ids, same users) plus a HOT
    //    ROSTER KEY — one in-roster user (9700 = 97·100) owning an
    //    eleventh copy's worth of rows (~9% of the table). The purge
    //    path must stay balanced because it never shuffles on user_id:
    //    the roster broadcasts and the audit is map-side counts.
    //  - documents: the 10× corpus plus ONE DOMINANT CLUSTER — 400
    //    near-copies of a single doc (just under Buckets.DefaultCap, the
    //    worst bucket the cap admits), so the split op's pair expansion
    //    and component solve see a C(400,2)-pair cluster.
    //  - embeddings: the 10× corpus plus ONE DOMINANT CELL — 50k
    //    vectors in a tight blob around one base vector, so ~1/3 of the
    //    corpus lands in a single k-means cell and the per-cell quota
    //    window must be saved by its partial limit (WindowGroupLimit /
    //    TopKPerKey), not by data balance.
    val adv = s"$work/adv"
    val ev = sources.Tables.load(spark, "/root/testdata/sf0.1", "events")
    (0 until copies).map { c =>
      ev.withColumn("event_id", col("event_id") + lit(c * 100000000L))
    }.reduce(_.unionByName(_))
      .unionByName(ev
        .withColumn("event_id", col("event_id") + lit(copies * 100000000L))
        .withColumn("user_id", lit(9700L)))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$adv/events.parquet")
    val oneDoc = base.orderBy("doc_id").limit(1)
    spark.read.parquet(s"$work/documents.parquet")
      .unionByName(oneDoc.crossJoin(spark.range(1, 401).toDF("i"))
        .select((lit(900000000L) + col("i")).as("doc_id"),
          concat(col("text"), lit(" domtoken"), col("i")).as("text"),
          col("lang"), col("source"), col("n_chars")))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$adv/documents.parquet")
    val oneVec = emb.orderBy("vec_id").limit(1)
    spark.read.parquet(s"$work/embeddings.parquet")
      .unionByName(oneVec.crossJoin(spark.range(1, 50001).toDF("i"))
        .select((lit(900000000L) + col("i")).as("vec_id"),
          transform(col("embedding"),
            x => x + (col("i") % 100).cast("float") * lit(0.0001f)).as("embedding")))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$adv/embeddings.parquet")

    // driver r8 close: dominant-length corpus for the global-id
    // assignment — 90% of the 10× corpus shares ONE n_chars value, so
    // a per-length window would push ~50k rows through one partition;
    // the E125 two-phase rank's (n_chars, id DIV 4096) bucket bounds
    // every window partition at 4096 regardless. The naive global
    // ROW_NUMBER twin is timed for contrast (its sort is ONE task by
    // construction — the shape the operator exists to avoid).
    val advIds = s"$work/adv_ids"
    spark.read.parquet(s"$work/documents.parquet")
      .withColumn("n_chars",
        when(col("doc_id") % 10 =!= 0, lit(100L)).otherwise(col("n_chars")))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$advIds/documents.parquet")

    val queries = Seq(
      "global_ids_two_phase" ->
        ((s: SparkSession, _: String) => ExtQueries.pipelineGlobalIds(s, advIds)),
      "global_ids_naive_window" -> ((s: SparkSession, _: String) => {
        import org.apache.spark.sql.expressions.Window
        sources.Tables.load(s, advIds, "documents").select(col("doc_id"), col("n_chars"))
          .withColumn("global_id", row_number().over(Window
            .orderBy(col("n_chars").asc_nulls_first, col("doc_id").asc_nulls_first))
            .cast("long") - 1L)
      }),
      "dedup_ngram_jaccard" -> (ExtQueries.dedupNgramJaccard _),
      // round 7: the scale-safe composition — candidates from LSH bands,
      // exact Jaccard only on candidates; at 10× dup density the exact
      // detector's pair stream is Σ|posting|² (quadratic in density, the
      // 138 s stage above) while this one is bounded by the candidate set
      "dedup_ngram_verified" -> (ExtQueries.dedupNgramVerified _),
      "dedup_minhash_lsh" -> (ExtQueries.dedupMinhashLsh _),
      // round 7: the incremental path at 10× dup density — the batch
      // (1/7th of the corpus) dedups against the stored band state;
      // cost must track the batch, not the corpus, even when every
      // band is ~10 deep in near-identical members
      "pipeline_dedup_incremental" -> (ExtQueries.pipelineDedupIncremental _),
      "dedup_incremental_vs_stored" -> (dedupIncrementalVsStored _),
      // round 9: daily IVF maintenance vs the full retrain it replaces
      "sim_ivf_append_maint" -> (simIvfAppendMaint _),
      "sim_ivf_rebuild_maint" -> (simIvfRebuildMaint _),
      // r14: daily graph-edge maintenance vs the rebuild it replaces,
      // plus the stored-artifact query path, all at 10× edge volume
      "graph_append_maint" -> (graphAppendMaint _),
      "graph_rebuild_maint" -> (graphRebuildMaint _),
      "graph_ranks_stored_10x" -> (graphRanksStored _),
      "pipeline_dedup_incremental_clusters" -> (ExtQueries.pipelineDedupIncrementalClusters _),
      "dedup_clusters_incremental_vs_stored" -> (dedupClustersIncrementalVsStored _),
      "dedup_simhash" -> (ExtQueries.dedupSimhash _),
      // round 9: perceptual image dedup at 10× volume — the suffix
      // token gives every copy a distinct digest (distinct pattern),
      // so this row measures render+decode+hash throughput over 55k
      // images and block-shuffle balance, with hot buckets only from
      // the detector's own planted +1000000 pairs
      "dedup_image_phash" -> (ExtQueries.dedupImagePhash _),
      "dedup_audio_phash" -> (ExtQueries.dedupAudioPhash _),
      "dedup_embedding_cosine" -> (ExtQueries.dedupEmbeddingCosine _),
      "text_decontaminate" -> (ExtQueries.textDecontaminate _),
      // round 4: graph clustering + semantic dedup at 10× dup density —
      // every chunk has ~10 twins colliding in its 8-gram buckets, and
      // every embedding 10 same-cluster near-dups in its (cid, band)
      // buckets; the balance gate must hold through the propagation
      // rounds and the in-cluster pair expansion
      "dedup_clusters" -> (ExtQueries.dedupClusters _),
      "pipeline_dedup_canonical" -> (ExtQueries.pipelineDedupCanonical _),
      "dedup_semantic" -> (ExtQueries.dedupSemantic _),
      // round 5: substring-span dedup at 10× dup density — every 8-word
      // window of every doc has ~10 corpus-wide twins, so essentially
      // ALL positions survive the duplicate filter and the island merge
      // runs at full width; the digest groupBy must stay balanced
      "text_substring_spans" -> (ExtQueries.textSubstringSpans _),
      // round 6: segment dedup at 10× dup density — every 10-word
      // segment has ~10 corpus-wide twins (each copy differs only in
      // its final suffix token), so nearly every segment is cut and
      // the reassembly groupBy runs at full width; the digest window
      // must stay balanced with duplicate groups ~10 deep
      "text_segment_dedup" -> (ExtQueries.textSegmentDedup _),
      // driver r8: the r7 curation ops at their adversarial fixtures
      // (hot roster key / dominant cluster / dominant cell — see the
      // fixture construction above). All three read the `adv` dir.
      // driver r8: fuzzy ER under a MASS-DUPLICATE registry — the
      // baseline sf0.1 registry plus ONE name owned by 50k registry
      // rows, with the standard typo feed plus 5k dirty copies of that
      // same name. The distinct-name collapse must make this a
      // non-event (blocking volume ∝ distinct names; the mass name is
      // one weighted row), so the timing should track the baseline ER
      // run, not the 55k-row duplication.
      "er_fuzzy_mass_dup" -> ((s: SparkSession, _: String) => {
        val clean0 = sources.Tables.load(s, "/root/testdata/sf0.1", "customer")
          .select(col("c_custkey").as("key"), col("c_name").as("name"))
        val mass = s.range(1, 50001).toDF("i")
          .select((lit(900000000L) + col("i")).as("key"),
            lit("Customer#000000000").as("name"))
        val clean = clean0.unionByName(mass)
        val dirtyMass = s.range(1, 5001).toDF("i")
          .select((lit(970000000L) + col("i")).as("dirty_id"),
            lit("Customer#000000000").as("name"))
        val dirty = ExtQueries.erDirtyFeed(clean0).unionByName(dirtyMass)
        graft.operators.EntityResolution.resolve(dirty, clean, maxDist = 2)
      }),
      "er_fuzzy_baseline" ->
        ((s: SparkSession, _: String) => ExtQueries.erFuzzyMatch(s, "/root/testdata/sf0.1")),
      "delete_propagate_hot_roster_key" ->
        ((s: SparkSession, _: String) => ExtQueries.pipelineDeletePropagate(s, adv)),
      "split_leakage_dominant_cluster" ->
        ((s: SparkSession, _: String) => ExtQueries.pipelineSplitLeakageSafe(s, adv)),
      "diversity_quota_dominant_cell" ->
        ((s: SparkSession, _: String) => ExtQueries.sampleDiversityQuota(s, adv)))

    // SPARK_GRAFT_SMOKE_ONLY=q1,q2 restricts the run (local iteration)
    val selected = sys.env.get("SPARK_GRAFT_SMOKE_ONLY")
      .map { s => val keep = s.split(",").toSet; queries.filter(q => keep(q._1)) }
      .getOrElse(queries)
    println(s"| query | rows | sec | worst-stage tasks | median MB | max MB | max/median |")
    println(s"| --- | --- | --- | --- | --- | --- | --- |")
    selected.foreach { case (name, fn) =>
      val listener = new TaskBytes
      spark.sparkContext.addSparkListener(listener)
      // Time a noop WRITE, not count(): count() lets the optimizer
      // eliminate work — e.g. a left outer join whose right side
      // aggregates on the join key contributes nothing to the row
      // count and is removed wholesale, so segment dedup "measured"
      // 0.3 s of nothing. UNPERSISTED: a persist here made the timed
      // write also pay the MEMORY_AND_DISK cache-write, inflating the
      // reported seconds over the pure pipeline cost (ADVICE r4). The
      // untimed row count below re-plans from scratch instead — count()
      // pruning is harmless for a count, and the timing stays clean.
      // t0 BEFORE fn (matching Bench): operators that execute eagerly at
      // construction (runStar materializes rounds + checkpoints inside
      // mergeClusters) would otherwise do nearly all their compute
      // before the clock starts and the "cost tracks the batch" number
      // would time only the post-checkpoint joins (ADVICE r5).
      val t0 = System.nanoTime()
      val df = fn(spark, work)
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      val rows = df.count()
      val (ratio, medMb, maxMb, n) = listener.worstStage
      println(f"| $name | $rows | $sec%.1f | $n | $medMb%.1f | $maxMb%.1f | $ratio%.1f |")
      System.err.println(s"[smoke] $name worst ${listener.worstStageDetail}")
    }
    spark.stop()
  }
}


/** Seconds-vs-rows scaling EXPONENTS for the heaviest bench heads
  * (VERDICT r8 #3): each head runs at 1× (sf0.1), 10× and 100×
  * HETEROGENEOUS corpora, and the table reports per-decade exponents
  * e = ln(t_b/t_a)/ln(10) — t ∝ rowsᵉ, e ≈ 1 is linear. The 1×→10×
  * decade is overhead-dominated on 32 cores (a 5k-doc corpus doesn't
  * saturate the box, so e ≪ 1 there is headroom, not magic); the
  * 10×→100× decade is the honest scaling signal.
  *
  * The fixtures are deliberately NOT the dup-dense smoke corpus
  * (where every doc has 9 near-twins and pair output explodes): each
  * copy's words live in their own `_c` suffix namespace, so there is
  * ZERO cross-copy shingle/vocabulary overlap and the per-namespace
  * duplicate structure (the `% 10` plants) mirrors the 1× corpus
  * exactly — growth in work reflects corpus volume, not planted
  * density. Embeddings take a per-copy, per-dimension additive
  * perturbation (distinct directions — cosine-space distinct, unlike
  * a scalar rescale). The graph head reads full-width raw
  * orders/lineitem copies in disjoint key namespaces.
  *
  * Caveat stated with the results: heads whose QUERY SET grows with
  * the corpus by fixture construction (`% 25` query docs in BM25 /
  * hybrid RRF) do queries×corpus work — their honest exponent is ~2
  * unless the query set is held fixed, which a production deployment
  * (fixed query workload) would do.
  *
  * Usage: `sbt "runMain graft.ScaleExponents [workDir] [head,head,...]"`.
  */
/** Purge-verb cost decomposition at 1× / 10× (the VERDICT r9 #4/#5
  * follow-through): turns the scale claims — purge cost ∝ index size
  * (a rewrite, amortized to compliance cadence), retraction fold ∝
  * roster, query path unchanged — into measured seconds per phase.
  * Reuses the heterogeneous 10× corpus [[ScaleExponents]] generates
  * (run it first, or pass a dir that has x10/).
  *
  * Usage: `sbt "runMain graft.PurgeSmoke [heteroWorkDir]"`.
  */
object PurgeSmoke {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft_scale_hetero")
    val spark = Sessions.local("graft-purge-smoke")
    spark.sparkContext.setLogLevel("WARN")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def uuid() = java.util.UUID.randomUUID().toString.replace("-", "")
    println("| scale | family | build (s) | purge (s) | query (s) | rows_before | rows_after |")
    println("| --- | --- | --- | --- | --- | --- | --- |")
    Seq(("1x", "/root/testdata/sf0.1", "/root/testdata/sf0.1"),
        ("10x", s"$work/x10", s"$work/x10/graph_raw")).foreach {
      case (scale, docsDir, graphDir) =>
        // BM25 family
        locally {
          val base = java.nio.file.Files.createTempDirectory("graft-psmoke-bm").toString
          val (tbl, tbl2) = (s"psmoke_bm_${uuid()}", s"psmoke_bmd_${uuid()}")
          val d = ExtQueries.docs(spark, docsDir)
          val (s0, tBuild) = t(operators.Bm25Index.build(spark, d, tbl, s"$base/a"))
          val nB = spark.table(tbl).count()
          val roster = d.filter(col("doc_id") % 89 === 0).select(col("doc_id"))
          val ((s1, _), tPurge) =
            t(operators.Bm25Index.purge(spark, s0, roster, tbl2, s"$base/b"))
          val nA = spark.table(tbl2).count()
          val q = spark.table(tbl2).filter(col("doc_id") % 25 === 0)
            .select(col("doc_id").as("query_id"), col("word"))
          val (_, tQuery) = t(operators.Bm25Index.scoredTopK(spark, s1, q)
            .write.format("noop").mode("overwrite").save())
          println(f"| $scale | bm25 | $tBuild%.1f | $tPurge%.1f | $tQuery%.1f | $nB | $nA |")
          Seq(tbl, tbl2).foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
          operators.Checkpoints.deleteTree(java.nio.file.Paths.get(base))
        }
        // graph family
        locally {
          val base = java.nio.file.Files.createTempDirectory("graft-psmoke-g").toString
          val (tbl, tbl2) = (s"psmoke_g_${uuid()}", s"psmoke_gd_${uuid()}")
          val (s0, tBuild) =
            t(operators.GraphIndex.build(spark, ExtQueries.graphEdges(spark, graphDir), tbl, s"$base/a"))
          val nB = spark.table(tbl).count()
          val roster = sources.Tables.load(spark, graphDir, "orders")
            .filter(col("o_custkey") % 89 === 0)
            .select(concat(lit("c"), col("o_custkey")).as("node")).distinct()
          val ((s1, _), tPurge) =
            t(operators.GraphIndex.purge(spark, s0, roster, tbl2, s"$base/b"))
          val nA = spark.table(tbl2).count()
          val (_, tQuery) = t(operators.GraphIndex.ranks(spark, s1, iterations = 3)
            .write.format("noop").mode("overwrite").save())
          println(f"| $scale | graph | $tBuild%.1f | $tPurge%.1f | $tQuery%.1f | $nB | $nA |")
          Seq(tbl, tbl2).foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
          operators.Checkpoints.deleteTree(java.nio.file.Paths.get(base))
        }
    }
    spark.stop()
  }
}

object ScaleExponents {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft_scale_hetero")
    val spark = Sessions.local("graft-scale-exponents")
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"

    def gen(copies: Int, out: String): Unit = {
      val marker = java.nio.file.Paths.get(out, "_GENERATED")
      if (java.nio.file.Files.exists(marker)) return
      val base = sources.Tables.load(spark, sf, "documents")
      (0 until copies).map { c =>
        base.select(
          (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            w => concat(w, lit(s"_$c"))), " ").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_.unionByName(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      val emb = sources.Tables.load(spark, sf, "embeddings")
      (0 until copies).map { c =>
        emb.select((col("vec_id") + lit(c * 10000000L)).as("vec_id"),
          expr(s"transform(embedding, (x, i) -> x + CAST((i * ${c + 1}) % 7 AS FLOAT) * 0.01f)")
            .as("embedding"))
      }.reduce(_.unionByName(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      val orders = sources.Tables.load(spark, sf, "orders")
      val lineitem = sources.Tables.load(spark, sf, "lineitem")
      (0 until copies).map { c =>
        orders
          .withColumn("o_orderkey", col("o_orderkey") + lit(c * 1000000000L))
          .withColumn("o_custkey", col("o_custkey") + lit(c * 100000000L))
      }.reduce(_.unionByName(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$out/graph_raw/orders.parquet")
      (0 until copies).map { c =>
        lineitem
          .withColumn("l_orderkey", col("l_orderkey") + lit(c * 1000000000L))
          .withColumn("l_suppkey", col("l_suppkey") + lit(c * 100000000L))
      }.reduce(_.unionByName(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$out/graph_raw/lineitem.parquet")
      java.nio.file.Files.createFile(marker)
    }
    val (w10, w100) = (s"$work/x10", s"$work/x100")
    gen(10, w10)
    gen(100, w100)

    // fixed-workload variants (VERDICT r9 #3): the copies live in
    // disjoint doc_id/vec_id namespaces at +c·10⁷, so `id < 10⁷` pins
    // the query population to the 1× namespace at every scale — the
    // production shape (a fixed query workload against a growing
    // corpus), where the expected exponent is ~1 (scoring join ∝
    // corpus), versus the %25-grows-with-corpus fixture whose honest
    // exponent trends toward 2 (queries×corpus)
    val OneXNamespace = 10000000L
    val heads: Seq[(String, (SparkSession, String) => DataFrame, Boolean)] = Seq(
      ("graph_pagerank", ExtQueries.graphPageRank _, true),
      ("pipeline_curation_funnel", ExtQueries.pipelineCurationFunnel _, false),
      ("text_bm25_topk", ExtQueries.textBm25TopK _, false),
      ("text_bm25_topk_fixedq",
        (s: SparkSession, d: String) => ExtQueries.textBm25TopKWithQueries(
          s, d, col("doc_id") < OneXNamespace), false),
      ("sim_hybrid_rrf_fixedq",
        (s: SparkSession, d: String) => ExtQueries.simHybridRrfWithQueries(
          s, d, col("doc_id") < OneXNamespace, col("vec_id") < OneXNamespace), false),
      ("text_bpe_train_encode", ExtQueries.textBpeTrainEncode _, false),
      ("pipeline_delete_propagate_state", ExtQueries.pipelineDeletePropagateState _, false),
      ("sim_hybrid_rrf", ExtQueries.simHybridRrf _, false),
      ("pipeline_dedup_incremental_weights", ExtQueries.pipelineDedupIncrementalWeights _, false),
      ("dedup_clusters_star", ExtQueries.dedupClustersStar _, false),
      ("pipeline_dedup_published", ExtQueries.pipelineDedupPublished _, false),
      ("embed_pca_power", ExtQueries.embedPcaPower _, false))
    val selected = args.drop(1).headOption
      .map { s => val keep = s.split(",").toSet; heads.filter(h => keep(h._1)) }
      .getOrElse(heads)

    def time(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      spark.catalog.clearCache()
      operators.Checkpoints.sweep(spark.sparkContext)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // unmeasured warm-up: JVM/codegen/parquet-footer costs must not
    // land on the first head's 1× number (they did: 15.3 s vs the
    // benched 6.3 s for graph_pagerank)
    try ExtQueries.pipelineCurationFunnel(spark, sf)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[warmup] $e") }

    println("| head | t_1x (s) | t_10x (s) | t_100x (s) | e(1→10) | e(10→100) |")
    println("| --- | --- | --- | --- | --- | --- |")
    selected.foreach { case (name, fn, isGraph) =>
      def dirOf(w: String) = if (isGraph) s"$w/graph_raw" else w
      val t1 = time(fn, sf)
      val t10 = time(fn, dirOf(w10))
      val t100 = time(fn, dirOf(w100))
      val e10 = math.log(t10 / t1) / math.log(10.0)
      val e100 = math.log(t100 / t10) / math.log(10.0)
      println(f"| $name | $t1%.1f | $t10%.1f | $t100%.1f | $e10%.2f | $e100%.2f |")
    }
    spark.stop()
  }
}

/** 100×-decade cost decomposition for the STORED retrieval paths
  * (VERDICT r10 #6): [[PurgeSmoke]] stopped at 10× and had no hybrid
  * row. The three production stored query paths — BM25 top-k off
  * postings + spines, PageRank off the bucketed edges + degree spine,
  * hybrid RRF off postings + IVF lists — run against the 1×/10×/100×
  * heterogeneous corpora ([[ScaleExponents]] fixtures — run it first
  * or pass its work dir) with a FIXED query workload (query ids
  * pinned to the 1× namespace: the production shape, a fixed query
  * set against a growing corpus). The table reports seconds per phase
  * and per-decade exponents e = ln(t_b/t_a)/ln(10): build is the
  * nightly job (e ≈ 1, ∝ corpus); query off the bucketed artifacts is
  * the claim under test (expected e ≲ 0.3 — scoring joins against
  * grown postings/lists, query side fixed).
  *
  * Usage: `sbt "runMain graft.StoredRetrievalSmoke [heteroWorkDir]"`.
  */
object StoredRetrievalSmoke {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft_scale_hetero")
    val spark = Sessions.local("graft-stored-retrieval-smoke")
    spark.sparkContext.setLogLevel("WARN")
    val OneX = 10000000L
    def uuid() = java.util.UUID.randomUUID().toString.replace("-", "")
    def timed(f: => Unit): Double = {
      spark.catalog.clearCache()
      operators.Checkpoints.sweep(spark.sparkContext)
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // unmeasured warm-up (JVM/codegen must not land on the 1× build)
    try ExtQueries.pipelineCurationFunnel(spark, "/root/testdata/sf0.1")
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[warmup] $e") }

    val scales = Seq(
      ("1x", "/root/testdata/sf0.1", "/root/testdata/sf0.1"),
      ("10x", s"$work/x10", s"$work/x10/graph_raw"),
      ("100x", s"$work/x100", s"$work/x100/graph_raw"))
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double, Double)]

    scales.foreach { case (scale, docsDir, graphDir) =>
      // BM25: nightly build, then fixed-workload top-k off the artifact
      locally {
        val base = java.nio.file.Files.createTempDirectory("graft-srs-bm").toString
        val tbl = s"srs_bm_${uuid()}"
        var stored: operators.Bm25Index.Stored = null
        val tBuild = timed {
          stored = operators.Bm25Index.build(
            spark, ExtQueries.docs(spark, docsDir), tbl, base)
        }
        // fixed query set: 1×-namespace docs only, same ids at every scale
        val q = spark.table(tbl)
          .filter(col("doc_id") < OneX && col("doc_id") % 25 === 0)
          .select(col("doc_id").as("query_id"), col("word"))
        val tQuery = timed {
          operators.Bm25Index.scoredTopK(spark, stored, q)
            .write.format("noop").mode("overwrite").save()
        }
        rows += ((scale, "bm25_stored_topk", tBuild, tQuery))
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        operators.Checkpoints.deleteTree(java.nio.file.Paths.get(base))
      }
      // Graph: nightly edge-derivation build, then ranks off the artifact
      locally {
        val base = java.nio.file.Files.createTempDirectory("graft-srs-g").toString
        val tbl = s"srs_g_${uuid()}"
        var stored: operators.GraphIndex.Stored = null
        val tBuild = timed {
          stored = operators.GraphIndex.build(
            spark, ExtQueries.graphEdges(spark, graphDir), tbl, base)
        }
        val tQuery = timed {
          operators.GraphIndex.ranks(spark, stored, iterations = 3)
            .write.format("noop").mode("overwrite").save()
        }
        rows += ((scale, "graph_pagerank_stored", tBuild, tQuery))
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        operators.Checkpoints.deleteTree(java.nio.file.Paths.get(base))
      }
      // Hybrid RRF: BM25 + IVF artifacts built, then the fused query
      // with both legs' query ids pinned to the 1× namespace
      locally {
        import operators.{Bm25Index, KMeans, LatestPerKey}
        val base = java.nio.file.Files.createTempDirectory("graft-srs-h").toString
        val bmTbl = s"srs_hbm_${uuid()}"
        val ivfTbl = s"srs_hivf_${uuid()}"
        val all = sources.Tables.load(spark, docsDir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        var bm: Bm25Index.Stored = null
        var centroids: Seq[(Int, Array[Double])] = null
        val tBuild = timed {
          bm = Bm25Index.build(spark, ExtQueries.docs(spark, docsDir), bmTbl, s"$base/bm")
          centroids = KMeans.fit(all, k = 8, iterations = 3)
          KMeans.probe(all, centroids, nprobe = 1)
            .write.mode("overwrite").format("parquet")
            .option("path", s"$base/lists")
            .bucketBy(8, "cid").saveAsTable(ivfTbl)
        }
        val lexQ = spark.table(bmTbl)
          .filter(col("doc_id") < OneX && col("doc_id") % 25 === 0)
          .select(col("doc_id").as("query_id"), col("word"))
        val tQuery = timed {
          val lex = Bm25Index.scoredTopK(spark, bm, lexQ, k = 20)
            .select(col("query_id"), col("cand_id"), col("rank").as("r_lex"))
          val lists = spark.table(ivfTbl)
            .select(col("vec_id").as("neighbor_id"), col("v").as("c_vec"), col("cid"))
          val probes = KMeans.probe(
              all.filter(col("vec_id") < OneX && col("vec_id") % 25 === 0),
              centroids, nprobe = 2)
            .select(col("vec_id").as("query_id"), col("v").as("q_vec"), col("cid"))
          val vec = ExtQueries.ivfScore(lists, probes, k = 20)
            .select(col("query_id"), col("neighbor_id").as("cand_id"),
              col("rank").as("r_vec"))
          val fused = lex.join(vec, Seq("query_id", "cand_id"), "full_outer")
            .withColumn("rrf_fp",
              coalesce(expr("1000000 DIV (60 + r_lex)"), lit(0L)) +
                coalesce(expr("1000000 DIV (60 + r_vec)"), lit(0L)))
          LatestPerKey.topKRanked(fused, 5, Seq(col("query_id")),
              Seq(col("rrf_fp").desc_nulls_last, col("cand_id").asc_nulls_first))
            .write.format("noop").mode("overwrite").save()
        }
        rows += ((scale, "sim_hybrid_stored_rrf", tBuild, tQuery))
        Seq(bmTbl, ivfTbl).foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
        operators.Checkpoints.deleteTree(java.nio.file.Paths.get(base))
      }
    }

    println("| family | phase | t_1x (s) | t_10x (s) | t_100x (s) | e(1→10) | e(10→100) |")
    println("| --- | --- | --- | --- | --- | --- | --- |")
    rows.map(_._2).distinct.foreach { fam =>
      val byScale = rows.filter(_._2 == fam).map(r => r._1 -> (r._3, r._4)).toMap
      def e(a: Double, b: Double) = math.log(b / a) / math.log(10.0)
      Seq(("build", (p: (Double, Double)) => p._1),
          ("query", (p: (Double, Double)) => p._2)).foreach { case (phase, pick) =>
        val (t1, t10, t100) =
          (pick(byScale("1x")), pick(byScale("10x")), pick(byScale("100x")))
        println(f"| $fam | $phase | $t1%.1f | $t10%.1f | $t100%.1f | ${e(t1, t10)}%.2f | ${e(t10, t100)}%.2f |")
      }
    }
    spark.stop()
  }
}

/** Cost decomposition of the VERSIONED-TABLE verbs at 1×/10×/100×
  * (round 11, E163–E175): the copy-on-write vs merge-on-read trade
  * the gates assert qualitatively, measured — CoW delete pays a
  * holder rewrite at commit time; a DV delete commits positions and
  * moves the cost to a per-read broadcast anti-join; compaction
  * migrates back; vacuum is file deletes. Rosters: `% 97` for the
  * CoW delete, `% 89` for the DV delete (≈1% each, both spread
  * across every file).
  *
  * Usage: `sbt "runMain graft.TableVerbSmoke [heteroWorkDir]"`.
  */
object TableVerbSmoke {
  def main(args: Array[String]): Unit = {
    import graft.operators.VersionedTable
    val work = args.headOption.getOrElse("/tmp/graft_scale_hetero")
    val spark = Sessions.local("graft-table-verb-smoke")
    spark.sparkContext.setLogLevel("WARN")
    def timed(f: => Unit): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // unmeasured JVM/codegen warm-up
    try ExtQueries.layoutVersionedPublish(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[warmup] $e") }

    val spec = VersionedTable.Spec(Seq("n_chars"), "doc_id", 1 << 13)
    val scales = Seq(("1x", "/root/testdata/sf0.1"),
      ("10x", s"$work/x10"), ("100x", s"$work/x100"))
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
    scales.foreach { case (scale, dir) =>
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val root = java.nio.file.Files.createTempDirectory("graft-tvs").toString
      val layout = (df: org.apache.spark.sql.DataFrame) =>
        df.repartitionByRange(16, col("n_chars"), col("doc_id"))
          .sortWithinPartitions("n_chars")
      def readAgg(): Unit = {
        VersionedTable.read(spark, root)
          .agg(count(lit(1)), sum(col("doc_id"))).head(); ()
      }
      rows += ((scale, "create",
        timed { VersionedTable.create(spark, d, root, spec, layout); () }))
      rows += ((scale, "delete_cow",
        timed { VersionedTable.deleteRoster(spark, root, spec,
          d.filter(col("doc_id") % 97 === 0).select(col("doc_id"))); () }))
      rows += ((scale, "read_plain", timed { readAgg() }))
      rows += ((scale, "delete_dv",
        timed { VersionedTable.deleteRosterDV(spark, root, spec,
          d.filter(col("doc_id") % 89 === 0).select(col("doc_id"))); () }))
      rows += ((scale, "read_with_dv", timed { readAgg() }))
      rows += ((scale, "compact_dv",
        timed { VersionedTable.compactDeletes(spark, root, spec); () }))
      rows += ((scale, "read_compacted", timed { readAgg() }))
      // r11 verbs: predicate UPDATE (CoW band rewrite under the range
      // clustering) and OPTIMIZE bin-packing (threshold above every
      // file: the worst case, everything consolidates)
      rows += ((scale, "update_where",
        timed { VersionedTable.updateWhere(spark, root, spec,
          col("n_chars").between(200, 260), Map("lang" -> lit("xx")),
          layout); () }))
      // r12 verb: three-clause MERGE (the CDC-apply) — ≈2% updates by
      // key plus ≈1.7% fresh-key inserts; merge-on-read, so the cost
      // is bloom-probed holder scans + the batch, never a rewrite
      rows += ((scale, "merge", timed {
        val idT = d.schema("doc_id").dataType
        val src = d.filter(col("doc_id") % 53 === 0)
          .select(col("doc_id"), col("lang"),
            (col("n_chars") + 7).as("n_chars"))
          .unionByName(d.filter(col("doc_id") % 59 === 0)
            .select((col("doc_id") + 1000000000L).cast(idT).as("doc_id"),
              col("lang"), col("n_chars")))
        VersionedTable.merge(spark, root, spec, src,
          matchedUpdate = Map("n_chars" -> col("src_n_chars")),
          layout = layout); ()
      }))
      rows += ((scale, "read_merged", timed { readAgg() }))
      // r13 pin (VERDICT r12 §6): the `merge` row's residual exponent
      // is attributed to its roster growing with the table — this row
      // holds the batch CONSTANT (the 1× doc_id namespace exists at
      // every scale) so the verb's own cost is measured: expected
      // FLAT across both decades (holders bloom-probed, match join
      // reads only the batch's band, no existing file rewritten)
      val preMergeFixed = VersionedTable.headVersion(root).get
      rows += ((scale, "merge_fixed", timed {
        val idT = d.schema("doc_id").dataType
        val win = d.filter(col("doc_id") < 5000)
        val src = win.filter(col("doc_id") % 41 === 0)
          .select(col("doc_id"), col("lang"),
            (col("n_chars") + 3).as("n_chars"))
          .unionByName(win.filter(col("doc_id") % 43 === 0)
            .select((col("doc_id") + 2000000000L).cast(idT).as("doc_id"),
              col("lang"), col("n_chars")))
        VersionedTable.merge(spark, root, spec, src,
          matchedUpdate = Map("n_chars" -> col("src_n_chars")),
          layout = layout); ()
      }))
      // r15 verb: per-row commit attribution over a CONSTANT window
      // (the merge_fixed commit alone) — per-version stepping pays
      // that window's changed files + one manifest read per version,
      // never table bytes. Expected FLAT across decades.
      rows += ((scale, "feed_cv_fixed", timed {
        VersionedTable.changeFeedWithCommitVersions(spark, root,
          preMergeFixed, VersionedTable.headVersion(root).get)
          .agg(count(lit(1))).head(); ()
      }))
      // r14 verb: branch REBASE onto a moved main with a CONSTANT
      // divergence window (the 1× namespace again, disjoint key
      // offsets): setup (clone + the two sides' appends) is OUTSIDE
      // the timer — the measured verb is the replay alone (two
      // window-sized feeds + the disjointness semi-join + the
      // bloom-probed fold). Expected FLAT across decades; the replay
      // batch lands under MAIN's root, so the branch dir retires
      // clean after.
      val br = root + "-br"
      locally {
        val idT = d.schema("doc_id").dataType
        val win = d.filter(col("doc_id") < 5000)
        VersionedTable.shallowClone(spark, root, br)
        VersionedTable.append(spark,
          win.filter(col("doc_id") % 47 === 0)
            .select((col("doc_id") + 3000000000L).cast(idT).as("doc_id"),
              col("lang"), col("n_chars")), br, spec, layout)
        VersionedTable.append(spark,
          win.filter(col("doc_id") % 49 === 0)
            .select((col("doc_id") + 4000000000L).cast(idT).as("doc_id"),
              col("lang"), col("n_chars")), root, spec, layout)
      }
      rows += ((scale, "rebase_fixed",
        timed { VersionedTable.rebaseBranch(spark, root, br, spec); () }))
      operators.Checkpoints.deleteTree(java.nio.file.Paths.get(br))
      rows += ((scale, "optimize_compact",
        timed { VersionedTable.optimizeCompact(spark, root, spec,
          targetBytes = 1L << 40); () }))
      rows += ((scale, "read_optimized", timed { readAgg() }))
      // r12 verb: metadata-only band delete — the decision is a
      // manifest filter; IO is ∝ straddling files only
      rows += ((scale, "delete_band",
        timed { VersionedTable.deleteBand(spark, root, spec,
          "n_chars", 300, 340); () }))
      rows += ((scale, "vacuum",
        timed { VersionedTable.vacuum(spark, root, keepLast = 1); () }))
      // r12 verbs: hidden partitioning — declaring bucket(16, doc_id)
      // LATE is one _META write (flat); migrating the existing data
      // under it is one recluster rewrite (∝ table, the one-off
      // OPTIMIZE price); the transform-pruned point lookup then reads
      // ~1/16 of the files — the row whose gap vs read_plain widens
      // a decade per decade
      val bkt = graft.operators.BucketTransform(16, "doc_id")
      rows += ((scale, "evolve_ptspec", timed {
        VersionedTable.evolvePartitioning(spark, root, Seq(bkt)); () }))
      rows += ((scale, "recluster_ptspec", timed {
        VersionedTable.recluster(spark, root, spec,
          graft.operators.PartitionTransform.clusterLayout(16, Seq(bkt))); () }))
      rows += ((scale, "pt_lookup", timed {
        VersionedTable.partitionPrunedRead(spark, root, "doc_id", 123L)
          .filter(col("doc_id") === 123L).count(); () }))
      operators.Checkpoints.deleteTree(java.nio.file.Paths.get(root))
    }
    println("| verb | t_1x (s) | t_10x (s) | t_100x (s) | e(1→10) | e(10→100) |")
    println("| --- | --- | --- | --- | --- | --- |")
    rows.map(_._2).distinct.foreach { verb =>
      val t = rows.filter(_._2 == verb).map(r => r._1 -> r._3).toMap
      def e(a: Double, b: Double) = math.log(b / a) / math.log(10.0)
      println(f"| $verb | ${t("1x")}%.2f | ${t("10x")}%.2f | ${t("100x")}%.2f | ${e(t("1x"), t("10x"))}%.2f | ${e(t("10x"), t("100x"))}%.2f |")
    }
    spark.stop()
  }
}

/** ICT COMMIT-COST smoke (VERDICT r15 #3): per-stamped-commit
  * control-plane reads and wall time at three commit-history depths —
  * 5, 50, 500 — on one `ict=on` table. The r15 shape re-derived the
  * all-history max stamp on every commit (every version's `_SUCCESS`
  * probed, the whole `_ts_index` parsed: O(history) per commit,
  * O(history²) cumulative); the `_ts_max` running-max line makes the
  * stamp read O(1), and this smoke states it as counted store ops at
  * a 500-commit table: expect ZERO `_ts_index` reads, ONE `_ts_max`
  * read, and `_META`/exists counts that do not grow with depth.
  *
  * Usage: `sbt "runMain graft.IctCommitSmoke"`.
  */
object IctCommitSmoke {
  def main(args: Array[String]): Unit = {
    import graft.operators.{LocalTableStore, TableStore, VersionedTable}
    val spark = Sessions.local("graft-ict-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-ict-smoke").toString + "/t"
    val spec = VersionedTable.Spec(Seq("n"), "k", 1 << 10)
    VersionedTable.create(spark,
      (0L until 16L).map(i => (i, i)).toDF("k", "n"), root, spec)
    VersionedTable.setInCommitTimestamps(spark, root)
    val tsIndexReads = new java.util.concurrent.atomic.AtomicLong(0)
    val tsMaxReads = new java.util.concurrent.atomic.AtomicLong(0)
    val metaReads = new java.util.concurrent.atomic.AtomicLong(0)
    val existsCalls = new java.util.concurrent.atomic.AtomicLong(0)
    val listCalls = new java.util.concurrent.atomic.AtomicLong(0)
    // the shared forwarder (graft.operators.ForwardingTableStore)
    // keeps this probe and the spec-side wrappers on ONE delegation
    // surface — a hand-rolled copy had already drifted from the specs'
    // on the cross-process CAS methods
    val counting = new graft.operators.ForwardingTableStore(LocalTableStore) {
      override def exists(p: String) = {
        existsCalls.incrementAndGet(); super.exists(p)
      }
      override def readString(p: String) = {
        if (p.endsWith("_ts_index")) tsIndexReads.incrementAndGet()
        if (p.endsWith("_ts_max")) tsMaxReads.incrementAndGet()
        if (p.endsWith("_META")) metaReads.incrementAndGet()
        super.readString(p)
      }
      // the OTHER O(history) commit cost (VERDICT r15 missing #2):
      // version allocation used to LIST the whole manifest root per
      // commit; the `_NEXT` watermark makes it two point reads, so a
      // stamped commit at depth 500 must LIST nothing at all
      override def listNames(p: String) = {
        listCalls.incrementAndGet(); super.listNames(p)
      }
    }
    var committed = 2 // create + set-ict
    println("history  commit_s  ts_index_reads  ts_max_reads  meta_reads  exists_calls  list_calls")
    Seq(5, 50, 500).foreach { target =>
      while (committed < target) {
        VersionedTable.setInCommitTimestamps(spark, root); committed += 1
      }
      TableStore.set(counting)
      try {
        tsIndexReads.set(0); tsMaxReads.set(0)
        metaReads.set(0); existsCalls.set(0); listCalls.set(0)
        val t0 = System.nanoTime()
        VersionedTable.setInCommitTimestamps(spark, root)
        committed += 1
        println(f"$target%7d  ${(System.nanoTime() - t0) / 1e9}%8.3f  " +
          f"${tsIndexReads.get()}%14d  ${tsMaxReads.get()}%12d  " +
          f"${metaReads.get()}%10d  ${existsCalls.get()}%12d  " +
          f"${listCalls.get()}%10d")
      } finally TableStore.set(LocalTableStore)
    }
    // end-to-end sanity: stamps remain strictly increasing at depth 500
    val stamps = VersionedTable.publishedVersions(root)
      .flatMap(v => VersionedTable.versionMeta(root, v).get("commit_ts"))
      .map(_.toLong)
    require(stamps.sliding(2).forall { case Seq(a, b) => a < b; case _ => true },
      "stamps must be strictly increasing")
    println(s"stamped=${stamps.length} strictly_increasing=true")
    spark.stop()
  }
}
