package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Round-4 operators: connected components (fixed-round and converged
  * variants), chunking geometry, chunk-graph clustering on controlled
  * fixtures, semantic dedup's planted-duplicate recovery, and the ORC
  * roundtrip's batch-twin equality.
  */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(vertices: Seq[Long], edges: Seq[(Long, Long)], iterations: Int) =
    ConnectedComponents.labelPropagate(
        vertices.toDF("id"), edges.toDF("src", "dst"), iterations)
      .as[(Long, Long)].collect().toMap

  test("labelPropagate: path graph needs diameter rounds, then is exact") {
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 9L)
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    // after 1 round the min label has only travelled one hop
    val r1 = cc(verts, edges, 1)
    assert(r1(2L) == 1L && r1(5L) == 4L)
    // diameter (4) rounds make every path vertex exact; isolated stays itself
    val r4 = cc(verts, edges, 4)
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(r4(_) == 1L))
    assert(r4(9L) == 9L)
    // extra rounds are a no-op at the fixed point
    assert(cc(verts, edges, 7) == r4)
  }

  test("labelPropagate: separate components keep separate minima") {
    val r = cc(Seq(1L, 2L, 3L, 10L, 11L, 12L),
      Seq(1L -> 2L, 2L -> 3L, 11L -> 10L, 11L -> 12L), 3)
    assert(r(1L) == 1L && r(2L) == 1L && r(3L) == 1L)
    assert(r(10L) == 10L && r(11L) == 10L && r(12L) == 10L)
  }

  test("labelPropagate: no edges -> every vertex is its own component") {
    val r = cc(Seq(4L, 7L, 2L), Seq.empty, 2)
    assert(r == Map(4L -> 4L, 7L -> 7L, 2L -> 2L))
  }

  test("run (convergence-checked) equals fixed-round propagation at the fixed point") {
    // two chains + a triangle + an isolate, mixed orientations
    val verts = (1L to 12L).toSeq
    val edges = Seq(1L -> 2L, 3L -> 2L, 3L -> 4L, 4L -> 5L,
      7L -> 6L, 7L -> 8L, 10L -> 11L, 11L -> 12L, 12L -> 10L)
    val fixed = cc(verts, edges, verts.size)
    val converged = ConnectedComponents.run(verts.toDF("id"), edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(converged == fixed)
  }

  test("textChunks: 32/16 window geometry on the smoke corpus") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_words"))
      .as[(Long, Long)].collect().toMap
    val chunks = ExtQueries.textChunks(spark, sfSmoke)
      .as[(Long, Long, Long, String)].collect()
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet)
    byDoc.foreach { case (docId, rows) =>
      val n = docs(docId)
      val idxs = rows.map(_._2).sorted
      // one chunk per stride offset inside the doc, contiguous from 0
      assert(idxs.toSeq == (0L to (n - 1) / 16).toSeq)
      rows.foreach { case (_, idx, nw, _) =>
        // window holds min(32, words remaining after the offset)
        assert(nw == math.min(32L, n - idx * 16))
      }
    }
  }

  test("dedupClustersOf: a doc's overlapping chunks form one component via multi-hop propagation") {
    // 112 words -> 7 chunks (offsets 0,16,...,96), every chunk >= 8 words:
    // a path of diameter 6, so exactness NEEDS >= 6 propagation rounds —
    // this is the multi-hop case that distinguishes components from pairs.
    // Disjoint vocabularies keep the two docs in distinct components.
    val docA = (1 to 112).map(i => s"a$i").mkString(" ")
    val docB = (1 to 80).map(i => s"b$i").mkString(" ")
    val out = ExtQueries.dedupClustersOf(Seq((1L, docA), (2L, docB)).toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect()
    val compsA = out.filter(_._1 == 1L).map(_._3).distinct
    val compsB = out.filter(_._1 == 2L).map(_._3).distinct
    assert(out.filter(_._1 == 1L).length == 7)
    assert(compsA.toSeq == Seq(1L * 10000 + 0), "all 7 chunks of doc 1 collapse to the min chunk id")
    assert(compsB.toSeq == Seq(2L * 10000 + 0))
  }

  test("dedupClustersOf: sub-8-word tail chunk is its own singleton component") {
    // 36 words -> chunks at 0 (32w), 16 (20w), 32 (4w): the 4-word tail
    // has no 8-gram, so it stays isolated — the documented artifact.
    val doc = (1 to 36).map(i => s"w$i").mkString(" ")
    val out = ExtQueries.dedupClustersOf(Seq((5L, doc)).toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(out == Map(0L -> 50000L, 1L -> 50000L, 2L -> 50002L))
  }

  test("dedupClustersOf: identical docs merge into one cross-doc component") {
    val doc = (1 to 40).map(i => s"t$i").mkString(" ")
    val out = ExtQueries.dedupClustersOf(Seq((1L, doc), (2L, doc)).toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect()
    // every >=8-word chunk of BOTH docs lands in doc 1's component
    val big = out.filter(_._2 <= 1L)
    assert(big.nonEmpty && big.forall(_._3 == 10000L))
  }

  test("dedupSemantic: same-cluster planted copies removed, bases never removed") {
    val out = ExtQueries.dedupSemantic(spark, sfSmoke)
      .as[(Long, Int, Boolean)].collect()
    val (planted, base) = out.partition(_._1 >= 1000000L)
    assert(planted.nonEmpty)
    assert(base.forall(_._3), "no base vector may be removed (corpus has no natural dups)")
    // a copy can only escape by straddling a cluster boundary (the
    // inherent SemDeDup approximation — the coarse quantizer is the
    // recall/cost trade); every copy that shares its base's cluster
    // must be caught by the in-cluster banding
    val baseCid = base.map(r => r._1 -> r._2).toMap
    val (sameCluster, boundary) = planted.partition(r => baseCid(r._1 - 1000000L) == r._2)
    assert(sameCluster.forall(!_._3), "same-cluster perturbed copies must be removed")
    assert(boundary.length <= planted.length / 10,
      s"cluster-boundary escapes should be rare (got ${boundary.length}/${planted.length})")
  }

  test("minhash_bands: native fused expression == composed column-expression form") {
    import graft.functions.TextFunctions
    val docs = Seq(
      (1L, (1 to 40).map(i => s"w${i % 13}").mkString(" ")), // repeated shingles
      (2L, "one two three four five six"),
      (3L, "a b"), // shorter than the shingle width -> empty -> null
      (4L, (1 to 7).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val shingleArr = array_distinct(TextFunctions.shingles(split(col("text"), " "), 3))
    // the query's chunked-md5 scheme (slot q*4+r = hex chunk r of
    // md5(q ':' shingle)) as plain column expressions, as r1-r3 computed
    // it via explode+groupBy and as the DuckDB oracle still states it
    val refSigs = array((0 until 16).map { i =>
      array_min(transform(shingleArr, sh =>
        substring(md5(concat(lit(s"${i / 4}:"), sh).cast("binary")), (i % 4) * 8 + 1, 8)))
    }: _*)
    val out = docs.select(
        col("doc_id"),
        call_function("minhash_bands", shingleArr, lit(16), lit(4)).as("mb"),
        when(size(shingleArr) === 0, lit(null).cast("array<string>"))
          .otherwise(concat(refSigs, TextFunctions.lshBands(refSigs, 4, 4))).as("ref"))
      .as[(Long, Option[Seq[String]], Option[Seq[String]])].collect()
    out.foreach { case (id, native, ref) =>
      assert(native == ref, s"doc $id: native $native != reference $ref")
    }
    assert(out.find(_._1 == 3L).get._2.isEmpty, "no-shingle doc must yield null")
  }

  test("dedup_minhash_lsh plan evaluates minhash_bands exactly once") {
    // r16 FanOut places a round-robin repartition between the corpus
    // union and the banding projection, so the expression is no longer
    // pushdown-cloned into each union branch: it must appear EXACTLY
    // once, above the fan-out — a second copy would mean
    // CollapseProject inlined it into multiple consumers (the
    // double-evaluation this pin exists to forbid)
    val plan = ExtQueries.dedupMinhashLsh(spark, sfSmoke)
      .queryExecution.optimizedPlan.toString
    assert("minhash_bands".r.findAllIn(plan).size == 1, plan.take(4000))
  }

  test("streaming outer interval join equals the batch LEFT JOIN (sentinel flushes the tail)") {
    val streaming = ExtQueries.streamingIntervalJoinOuter(spark, sfSmoke)
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    val ev = graft.sources.Tables.events(spark, sfSmoke)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts_ns DIV 1000").as("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("us").as("click_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("us").as("purchase_us"))
    val batchProper = clicks.join(
        purchases.withColumnRenamed("user_id", "p_user"),
        col("user_id") === col("p_user") &&
          col("purchase_us") >= col("click_us") &&
          col("purchase_us") <= col("click_us") + 21600000000L,
        "left")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (col("purchase_us") - col("click_us")).as("lag_us"))
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(streaming == batchProper)
    assert(streaming.exists(_._3.isEmpty), "unmatched clicks must appear null-extended")
    assert(streaming.forall(_._1 >= 0), "sentinel rows must not leak into the result")
  }

  test("video modality: container round trip, frame sampling skips undecoded frames") {
    import graft.operators.Multimodal
    val out = Multimodal.videoFeatures(
        Seq((1L, "hello video world"), (2L, "x")).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Long, Int, Int, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    out.values.foreach { case (id, n, fps, durMs, nSampled, w, h, sumPx, hex) =>
      assert(n >= 4 && n <= 11, s"doc $id frames $n")
      assert(Seq(4L, 5L, 8L, 10L).contains(fps))
      assert(durMs == n * (1000 / fps))
      // stride-4 sampling: ceil(n/4) frames decoded, each w×h
      assert(nSampled == (n + 3) / 4)
      assert(sumPx == nSampled * w.toLong * h)
      assert(w >= 64 && w <= 176 && h >= 64 && h <= 176)
      assert(hex.length == 64)
    }
  }

  test("mineContrastivePairs: planted dups surface as positives, negatives always mined") {
    val out = ExtQueries.mineContrastivePairs(spark, sfSmoke)
      .as[(Long, Option[Long], Option[Double], Option[Long], Option[Double])].collect()
    assert(out.nonEmpty)
    out.foreach { case (anchor, posId, posCos, negId, negCos) =>
      assert(negId.nonEmpty && negCos.exists(_ < 0.95),
        s"anchor $anchor: hard negative must exist below the dup threshold")
      // anchors at %50==0 have a planted perturbed copy (%10 fixture ∩
      // %25 anchors); the copy must surface as the positive
      if (anchor % 50 == 0 && anchor < 1000000L)
        assert(posId.contains(anchor + 1000000L) && posCos.exists(_ >= 0.95),
          s"anchor $anchor: planted copy must be the mined positive, got $posId")
      posCos.foreach(c => assert(c >= 0.95))
    }
    assert(out.exists(_._2.isEmpty), "anchors without a planted dup emit a null positive")
  }

  test("pipelineDedupCanonical: planted copies collapse to their base, bases kept") {
    val out = ExtQueries.pipelineDedupCanonical(spark, sfSmoke)
      .as[(Long, Long, Boolean)].collect()
    val comp = out.map(r => r._1 -> r._2).toMap
    val removed = out.filter(!_._3)
    assert(removed.nonEmpty, "the planted near-dups must produce removals")
    // canonical rule: removed docs collapse to a strictly lower id;
    // keep <=> being one's own component minimum
    removed.foreach { case (id, c, _) => assert(c < id, s"doc $id -> $c") }
    out.filter(_._3).foreach { case (id, c, _) => assert(c == id) }
    // cluster consistency: every detected pair agrees on its component
    // (the detector may also find NATURAL near-dups between base docs —
    // the tiny synthetic vocabulary makes jaccard>=0.4 base pairs real)
    ExtQueries.dedupMinhashLsh(spark, sfSmoke)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect()
      .foreach { case (a, b) =>
        assert(comp(a) == comp(b), s"pair ($a,$b) split across components")
      }
    // every planted copy whose pair the detector surfaced is removed
    val plantedRemoved = removed.count(_._1 >= 1000000L)
    assert(plantedRemoved > 0, "planted copies must appear among removals")
  }

  test("textBigramLm: inverse-frequency scores are >= 1, no-bigram docs score null") {
    val out = ExtQueries.textBigramLm(spark, sfSmoke)
      .as[(Long, Long, Option[Double])].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, nBg, score) =>
      if (nBg == 0) assert(score.isEmpty, s"doc $id")
      else {
        // every term is N/c with c <= N, so the mean is >= 1; a doc of
        // corpus-unique bigrams scores exactly N/1 = N-ish (rarity)
        assert(score.exists(_ >= 1.0), s"doc $id score $score")
      }
    }
  }

  test("kmv_distinct: exact below k, ~12% estimates above, partition-invariant") {
    val small = (1 to 40).map(i => s"v$i") ++ (1 to 40).map(i => s"v$i") // dups collapse
    val big = (1 to 5000).map(i => s"x$i")
    def estimate(vals: Seq[String], parts: Int): Double =
      vals.toDF("v").repartition(parts)
        .agg(expr("kmv_distinct(v, 64)").as("e")).as[Double].head()
    // fewer than k distinct -> exact regardless of duplicates
    assert(estimate(small, 3) == 40.0)
    // above k -> estimate within the ~1/sqrt(k) error band
    val est = estimate(big, 7)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.35, s"estimate $est")
    // min-k merge is associative: any partitioning gives the SAME value
    assert(estimate(big, 1) == est && estimate(big, 32) == est)
  }

  test("SaltedJoin: row-identical to the plain join under a forced shuffle join") {
    import graft.operators.SaltedJoin
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // exercise the SMJ path
    try {
      // hot key 1 (half the left side), duplicate right keys, unmatched
      // left rows — every exactness hazard at once
      val left = ((1 to 500).map(_ => (1L, "hot")) ++
        (2 to 100).map(i => (i.toLong, s"v$i")) ++ Seq((9999L, "orphan")))
        .toDF("k", "payload").repartition(13)
      val right = (Seq((1L, "a"), (1L, "b")) ++ (2 to 80).map(i => (i.toLong, s"r$i")))
        .toDF("k", "rv")
      def sorted(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, String, Option[String])].collect().sortBy(r => (r._1, r._2, r._3))
      val salted = sorted(SaltedJoin(left, right, Seq("k"), numSalts = 8, "left"))
      val plain = sorted(left.join(right, Seq("k"), "left"))
      assert(salted.toSeq == plain.toSeq)
      assert(salted.exists(_._3.isEmpty), "unmatched left rows survive null-extended")
      intercept[IllegalArgumentException] {
        SaltedJoin(left, right, Seq("k"), 8, "full_outer")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("textDecontaminateFuzzy: planted eval copies flagged with their base as best match") {
    val out = ExtQueries.textDecontaminateFuzzy(spark, sfSmoke)
      .as[(Long, Boolean, Option[Long], Option[Double])].collect()
    // every +1M copy of an eval doc (base % 50 == 0) must be flagged and
    // matched back to exactly its base; copies of non-eval docs may only
    // be flagged if they have a NATURAL near-dup in the eval slice
    val planted = out.filter(r => r._1 >= 1000000L && (r._1 - 1000000L) % 50 == 0)
    assert(planted.nonEmpty)
    // banding is probabilistic: a copy at est ~0.75 has ~86% band recall
    // (1-(1-0.75^4)^4), so an occasional planted miss is the operator
    // working as specified — assert recall, not perfection
    val flagged = planted.filter(_._2)
    assert(flagged.length * 10 >= planted.length * 6,
      s"recall too low: ${flagged.length}/${planted.length}")
    flagged.foreach { case (id, _, _, est) => assert(est.exists(_ >= 0.4), s"copy $id") }
    // the best match is usually the copy's own base (a NATURAL eval
    // near-dup with an equal estimate can win the lowest-id tie-break)
    val home = flagged.count(r => r._3.contains(r._1 - 1000000L))
    assert(home * 2 > flagged.length, s"only $home/${flagged.length} mapped to their base")
    assert(out.exists(!_._2), "clean training docs must exist")
  }

  test("eventsAnomalyZscore: full-window hours score, warm-up hours are null") {
    val out = Queries.eventsAnomalyZscore(spark, sfSmoke)
      .as[(String, String, Long, Option[Double])].collect()
    val byType = out.groupBy(_._1)
    byType.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      // the first 24 spine hours have no full trailing window
      assert(sorted.take(24).forall(_._4.isEmpty))
      assert(sorted.drop(24).exists(_._4.nonEmpty), "scores must appear after warm-up")
    }
  }

  test("labelPropagate == in-memory union-find on random graphs (15 rounds)") {
    val rnd = new scala.util.Random(11)
    (1 to 15).foreach { round =>
      val nVerts = 5 + rnd.nextInt(40)
      val verts = (0 until nVerts).map(_.toLong)
      val edges = List.fill(rnd.nextInt(60))(
        (rnd.nextInt(nVerts).toLong, rnd.nextInt(nVerts).toLong))
      // reference: plain union-find with path compression
      val parent = Array.tabulate(nVerts)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = verts.map(v => v ->
        verts.filter(u => find(u.toInt) == find(v.toInt)).min).toMap
      // nVerts rounds >= any diameter -> exact components
      val got = cc(verts, edges, nVerts)
      assert(got == expected, s"round=$round verts=$nVerts edges=${edges.length}")
    }
  }

  test("SaltedJoin == plain join on random skewed data (inner and left, 6 rounds)") {
    import graft.operators.SaltedJoin
    val rnd = new scala.util.Random(23)
    (1 to 6).foreach { round =>
      val left = List.fill(150) {
        val k = if (rnd.nextBoolean()) 0L else rnd.nextInt(30).toLong
        (k, rnd.nextInt(1000))
      }.toDF("k", "lv").repartition(1 + rnd.nextInt(10))
      val right = List.fill(40)((rnd.nextInt(40).toLong, rnd.nextInt(1000)))
        .toDF("k", "rv")
      for (jt <- Seq("inner", "left"); salts <- Seq(1, 7)) {
        val salted = SaltedJoin(left, right, Seq("k"), salts, jt)
          .as[(Long, Int, Option[Int])].collect().toSeq.sorted
        val plain = left.join(right, Seq("k"), jt)
          .as[(Long, Int, Option[Int])].collect().toSeq.sorted
        assert(salted == plain, s"round=$round jt=$jt salts=$salts")
      }
    }
  }

  test("nearest_centroid: native argmin bit-identical to the composed-HOF fold") {
    import graft.operators.KMeans
    val rnd = new scala.util.Random(31)
    val centroids = (0 until 5).map(c => c -> Array.fill(16)(rnd.nextDouble() * 2 - 1))
    val vecs = (0 until 200).map(i => (i.toLong, Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
      .toDF("vec_id", "v")
    val native = vecs.select(col("vec_id"),
        call_function("nearest_centroid", col("v"),
          array(centroids.map { case (_, c) => array(c.map(lit(_)): _*) }: _*)).as("n"))
      .select(col("vec_id"), col("n.d2"), col("n.cid"))
      .as[(Long, Double, Int)].collect().sortBy(_._1)
    val hof = vecs.select(col("vec_id"), KMeans.nearestHof(centroids).as("n"))
      .select(col("vec_id"), col("n.d2"), col("n.cid"))
      .as[(Long, Double, Int)].collect().sortBy(_._1)
    native.zip(hof).foreach { case ((id, d2n, cn), (_, d2h, ch)) =>
      assert(cn == ch, s"vec $id cid")
      assert(java.lang.Double.doubleToLongBits(d2n) == java.lang.Double.doubleToLongBits(d2h),
        s"vec $id d2 bits")
    }
  }

  test("sourceOrcRoundtrip equals the direct parquet hourly aggregation") {
    val viaOrc = Queries.sourceOrcRoundtrip(spark, sfSmoke)
      .as[(String, String, Long, Double)].collect().toSet
    val direct = Queries.eventsHourlyAgg(spark, sfSmoke)
      .as[(String, String, Long, Double)].collect().toSet
    assert(viaOrc == direct)
  }
}
