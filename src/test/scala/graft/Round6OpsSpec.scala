package graft

import org.apache.spark.sql.functions._

/** Specs for the round-6 operators (segment dedup, PageRank, sample
  * quantile sketch, z-order layout).
  */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("segmentDedup: shifted copy removes all but the original's head segment") {
    // doc 2 = doc 1 minus its first 10 words: copy segment j aligns
    // with original segment j+1, so the original keeps ONLY segment 0
    // and the copy keeps nothing. doc 3 is untouched.
    val orig = words("a", 30)
    val copy = orig.split(" ").drop(10).mkString(" ")
    val d = Seq(
      (1L, orig), (2L, copy), (3L, words("u", 25))
    ).toDF("doc_id", "text")
    val got = ExtQueries.segmentDedup(d)
      .select("doc_id", "n_segments", "n_kept", "n_removed")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 1L, 2L), (2L, 2L, 0L, 2L), (3L, 3L, 3L, 0L)),
      s"unexpected: $got")
  }

  test("segmentDedup: unique corpus is untouched and reassembles to the input text") {
    val t1 = words("x", 25)
    val d = Seq((1L, t1), (2L, words("y", 12))).toDF("doc_id", "text")
    val got = ExtQueries.segmentDedup(d)
      .filter($"doc_id" === 1L)
      .select("n_removed", "clean_md5").as[(Long, String)].head()
    val expectMd5 = spark.range(1)
      .select(md5(lit(t1).cast("binary"))).as[String].head()
    assert(got == ((0L, expectMd5)), s"unexpected: $got")
  }

  test("segmentDedup: WITHIN-doc repetition is kept (cross-doc only, like RefinedWeb)") {
    // one doc repeats its own first segment; no other doc shares it
    val seg = words("r", 10)
    val d = Seq(
      (1L, seg + " " + seg),
      (2L, words("z", 15))
    ).toDF("doc_id", "text")
    val got = ExtQueries.segmentDedup(d)
      .filter($"doc_id" === 1L)
      .select("n_kept", "n_removed").as[(Long, Long)].head()
    assert(got == ((2L, 0L)), s"within-doc repeat must survive: $got")
  }

  test("pageRank: symmetric 2-cycle is the fixed point — each node holds S/2 forever") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val got = operators.PageRank.run(edges, iterations = 3)
      .select("node", "rank_fp").as[(String, Long)].collect().toMap
    val half = operators.PageRank.Scale / 2
    assert(got == Map("a" -> half, "b" -> half), s"unexpected: $got")
  }

  test("pageRank: 3-leaf star, one iteration, hand-computed fixed-point values") {
    // N=4, r0 = S/4. hub gets 3 whole leaf ranks; each leaf gets
    // (S/4) div 3 from the hub. base = (15*S div 100) div 4.
    val edges = Seq(("h", "l1"), ("h", "l2"), ("h", "l3"),
      ("l1", "h"), ("l2", "h"), ("l3", "h")).toDF("src", "dst")
    val got = operators.PageRank.run(edges, iterations = 1)
      .select("node", "out_deg", "rank_fp").as[(String, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val s = operators.PageRank.Scale
    val base = (15 * s / 100) / 4
    val hub = base + 85 * (3 * (s / 4)) / 100
    val leaf = base + 85 * ((s / 4) / 3) / 100
    assert(got == Map(
      "h" -> ((3L, hub)), "l1" -> ((1L, leaf)),
      "l2" -> ((1L, leaf)), "l3" -> ((1L, leaf))), s"unexpected: $got")
  }

  test("pageRank: total mass is conserved up to truncation loss") {
    val got = ExtQueries.graphPageRank(spark, sfSmoke)
      .agg(sum("rank_fp"), count(lit(1)), sum("out_deg"))
      .as[(Long, Long, Long)].head()
    val (total, n, e) = got
    val s = operators.PageRank.Scale
    // truncation loses < 1 unit per contrib div (one per edge per
    // round), < 1 per damped-product div (one per node per round),
    // plus < n on the initial split — bound by 3 rounds of (e + n) + n
    assert(total <= s && total >= s - (3 * (e + n) + n),
      s"mass $total of $s over $n nodes / $e edges")
  }

  test("sampleQuantile: k larger than the data makes the sketch exact") {
    // 101 rows, k=128 → the "sample" is the whole dataset, so the
    // index-pick quantiles are the exact order statistics
    val d = (0 to 100).map(i => (s"k$i", i.toDouble)).toDF("key", "v")
    val sk = d.agg(call_function("sample_sketch", $"key", $"v", lit(128)).as("sk"))
    val got = sk.select(
      ExtQueries.sampleQuantile($"sk", 0.25),
      ExtQueries.sampleQuantile($"sk", 0.5),
      ExtQueries.sampleQuantile($"sk", 0.75)).as[(Double, Double, Double)].head()
    assert(got == ((25.0, 50.0, 75.0)), s"unexpected: $got")
  }

  test("sample_merge of group sketches equals the direct sketch (lossless re-agg)") {
    val d = (0 until 1000).map(i => (i % 7, s"key$i", (i * 37 % 997).toDouble))
      .toDF("g", "key", "v")
    val k = 32
    val merged = d.groupBy("g")
      .agg(call_function("sample_sketch", $"key", $"v", lit(k)).as("sk"))
      .agg(call_function("sample_merge", $"sk", lit(k)).as("sk"))
    val direct = d.agg(call_function("sample_sketch", $"key", $"v", lit(k)).as("sk"))
    val m = merged.select(to_json($"sk")).as[String].head()
    val dd = direct.select(to_json($"sk")).as[String].head()
    assert(m == dd, s"merged $m != direct $dd")
  }

  test("sample_sketch keeps exactly the k smallest row-key hashes") {
    val d = (0 until 500).map(i => (s"row$i", i.toDouble)).toDF("key", "v")
    val n = d.agg(call_function("sample_sketch", $"key", $"v", lit(64)).as("sk"))
      .select(size($"sk")).as[Int].head()
    assert(n == 64)
  }

  test("cms_sketch array equals a driver-side simulation of the same updates") {
    val data = Seq("a", "b", "a", "c", "a", "b")
    val (d, w) = (4, 16)
    val got = data.toDF("k")
      .agg(call_function("cms_sketch", $"k", lit(d), lit(w)))
      .as[Seq[Long]].head()
    val sim = new Array[Long](d * w)
    for (k <- data; r <- 0 until d)
      sim(r * w + functions.CmsSketchAgg.bucket(r, k, w)) += 1L
    assert(got == sim.toSeq, s"engine sketch diverged from simulation")
  }

  test("cms vec_sum merge of group sketches equals the direct sketch; est >= exact") {
    val data = (0 until 600).map(i => (i % 5, s"w${i % 37}")).toDF("g", "k")
    val merged = data.groupBy("g")
      .agg(call_function("cms_sketch", $"k", lit(4), lit(64)).as("sk"))
      .agg(call_function("vec_sum", $"sk")).as[Seq[Long]].head()
    val direct = data.agg(call_function("cms_sketch", $"k", lit(4), lit(64)))
      .as[Seq[Long]].head()
    assert(merged == direct, "vec_sum merge diverged from the direct sketch")
    // CMS one-sided error: estimate never undercounts
    val est = ExtQueries.qaCmsFreq(spark, sfSmoke)
      .select($"word", $"n_exact", $"est_merged", $"est_direct")
      .as[(String, Long, Long, Long)].collect()
    assert(est.nonEmpty)
    est.foreach { case (wd, ex, em, ed) =>
      assert(em >= ex && ed >= ex, s"CMS undercounted $wd: exact $ex, est $em/$ed")
      assert(em == ed, s"merged/direct estimates diverged for $wd")
    }
  }

  test("qaKeySkew: top-10 shares are weight-ordered, bounded, and above average") {
    // qaKeySkew reads the real events table; assert the invariants:
    // exactly 10 rows, ppm shares sum below 1e6, weight-descending
    // order, and every top-10 key at least the average key load
    val rows = ExtQueries.qaKeySkew(spark, sfSmoke)
      .select($"n_rows", $"share_ppm", $"x_avg_fp")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 10)
    assert(rows.map(_._2).sum <= 1000000L)
    assert(rows.map(_._1).toSeq == rows.map(_._1).sortBy(-_).toSeq, "not weight-ordered")
    // only the HEAVIEST key is mathematically >= the mean (near-uniform
    // synthetic keys hover around it); integer div can shave 1 ppm
    assert(rows.head._3 >= 999999L, s"heaviest key below average: ${rows.head}")
    assert(rows.forall(_._3 > 0L))
  }

  test("curriculumBins: bins partition the corpus and are score-ordered") {
    val rows = ExtQueries.pipelineCurriculumBins(spark, sfSmoke)
      .select($"bin", $"score").as[(String, Double)].collect()
    val byBin = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byBin.keySet == Set("Q1", "Q2", "Q3", "Q4"), s"bins: ${byBin.keySet}")
    // every doc gets exactly one bin (total preserved)
    assert(rows.length == sources.Tables.load(spark, sfSmoke, "documents").count())
    // bin boundaries are ordered: max(Q1) <= min(Q3), max(Q2) <= min(Q4)
    assert(byBin("Q1").max <= byBin("Q3").min)
    assert(byBin("Q2").max <= byBin("Q4").min)
    // the 128-sample thresholds keep the quartiles roughly balanced
    byBin.values.foreach(v =>
      assert(v.length > rows.length / 10 && v.length < rows.length / 2,
        s"unbalanced bins: ${byBin.view.mapValues(_.length).toMap}"))
  }

  test("sketchSetAlgebra: sub-k sketches are exact; planted overlap is recovered on average") {
    val rows = ExtQueries.qaSketchSetAlgebra(spark, sfSmoke)
      .select($"est_n", $"est_union", $"est_inter")
      .as[(Double, Double, Double)].collect()
    assert(rows.length == 20)
    // every source holds 25 distinct docs < k=64 -> the sketch is exact
    rows.foreach { case (n, u, _) =>
      assert(n == 25.0, s"sub-k sketch must be exact, got $n")
      assert(u >= n, "union estimate below one of its sides")
    }
    // true per-source overlap with 'shared' is ~6.25 docs; individual
    // inclusion-exclusion estimates are noisy but the mean converges
    val meanInter = rows.map(_._3).sum / rows.length
    assert(meanInter > 0 && meanInter < 15, s"mean intersection $meanInter")
  }

  test("dedupWeights: planted near-dup pairs weigh 500k ppm, singletons 1M") {
    val rows = ExtQueries.pipelineDedupWeights(spark, sfSmoke)
      .select($"doc_id", $"cluster_size", $"weight_ppm")
      .as[(Long, Long, Long)].collect()
    val copies = rows.filter(_._1 >= 1000000L)
    // minhash banding is a recall≈1 heuristic, not a guarantee — assert
    // the floor, not perfection (the fuzzy-decontamination precedent)
    val clustered = copies.count(_._2 >= 2)
    assert(copies.nonEmpty && clustered >= (copies.length * 0.85).toInt,
      s"only $clustered/${copies.length} planted copies clustered")
    rows.foreach { case (_, size, w) =>
      assert(w == 1000000L / size, s"weight $w != 1e6/$size")
    }
    // cluster mass: weights within a cluster sum to ~1e6 (truncation)
    val mass = rows.groupBy(r => r._1).size // sanity: ids unique
    assert(mass == rows.length)
  }

  test("bpeMerges: top-20 adjacent char pairs, weight-ordered, all length 2") {
    val rows = ExtQueries.textBpeMerges(spark, sfSmoke)
      .as[(String, Long)].collect()
    assert(rows.length == 20)
    assert(rows.forall(_._1.length == 2))
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq)
  }

  test("streamingDistinctUsers equals the batch KMV computation row-for-row") {
    val streamed = ExtQueries.streamingDistinctUsers(spark, sfSmoke)
    val batch = sources.Tables.events(spark, sfSmoke)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(call_function("kmv_sketch", $"user_id".cast("string"), lit(64)).as("sk"),
        count(lit(1)).as("n_events"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"event_type", $"n_events",
        round(ExtQueries.kmvEstimate($"sk", 64), 6).as("n_users_est"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streaming sketch state diverged from the batch aggregation")
  }

  test("rollingDistinct: estimate is EXACT wherever the 3-hour frame holds < k users") {
    import org.apache.spark.sql.expressions.Window
    val got = ExtQueries.eventsRollingDistinct(spark, sfSmoke)
    // exact rolling distinct over the same observed-hour frame
    val e = sources.Tables.events(spark, sfSmoke).select($"event_type",
      expr("ts_ns div 3600000000000").as("hr"), $"user_id".cast("string").as("uk"))
    val w = Window.partitionBy("event_type").orderBy("hr").rowsBetween(-2, 0)
    val exact = e.groupBy("event_type", "hr")
      .agg(collect_set($"uk").as("us"))
      .select($"event_type", $"hr",
        size(array_distinct(flatten(collect_list($"us").over(w)))).as("n_exact"))
    val joined = got.join(exact, Seq("event_type", "hr"))
      .select($"n_users_3h_est", $"n_exact".cast("double"))
      .as[(Double, Double)].collect()
    val small = joined.filter(_._2 < 64)
    assert(small.nonEmpty, "fixture should have frames below k=64 distinct users")
    small.foreach { case (est, ex) =>
      assert(est == ex, s"sub-k frame must be exact: est $est != exact $ex")
    }
  }

  test("snapshotDiff: every doc lands in exactly the status its perturbation implies") {
    val ids = sources.Tables.load(spark, sfSmoke, "documents")
      .select($"doc_id").as[Long].collect().toSet
    val expected = Map(
      "removed" -> ids.count(_ % 17 == 0).toLong,
      "added" -> ids.count(_ % 29 == 0).toLong,
      "changed" -> ids.count(i => i % 13 == 0 && i % 17 != 0).toLong,
      "unchanged" -> ids.count(i => i % 13 != 0 && i % 17 != 0).toLong)
    val got = ExtQueries.pipelineSnapshotDiff(spark, sfSmoke)
      .groupBy("status").count()
      .as[(String, Long)].collect().toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("quantize_i8d is bit-identical to the composed-HOF quantization pipeline") {
    val v = sources.Tables.load(spark, sfSmoke, "embeddings")
    val hof = operators.Similarity.quantizeInt8(v)
      .select($"vec_id", transform($"q", _.cast("double")).as("qd"))
    val native = v.select($"vec_id",
      call_function("quantize_i8d", $"embedding").as("qd"))
    val joined = hof.join(native.withColumnRenamed("qd", "qn"), "vec_id")
      .select($"vec_id",
        zip_with($"qd", $"qn", (a, b) => a =!= b).as("diff"))
      .filter(exists($"diff", x => x))
    assert(joined.count() == 0, "native quantizer diverged from the HOF reference")
    // zero vector: scale falls back to 1, codes all 0.0
    val z = Seq((1L, Array.fill(4)(0.0f))).toDF("vec_id", "embedding")
      .select(call_function("quantize_i8d", $"embedding")).as[Seq[Double]].head()
    assert(z == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("zorderKey: interleaves bits (hand-checked values) and is monotone in both dims") {
    val d = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (3L, 5L))
      .toDF("a", "b")
    val got = d.select(operators.Layout.zorderKey($"a", $"b")).as[Long].collect().toSeq
    // a bits at odd positions, b bits at even: z(1,0)=2, z(0,1)=1,
    // z(1,1)=3, z(2,2)=12, z(3,5)=27 (a=011 -> 0_1_1 at odd, b=101 ->
    // 1_0_1 at even: 011011b = 27)
    assert(got == Seq(0L, 2L, 1L, 3L, 12L, 27L), s"unexpected: $got")
  }

  test("zorderLayout: a box query intersects fewer partition bounding boxes than linear sort") {
    import org.apache.spark.sql.functions.{min => fmin, max => fmax}
    // 64x64 grid; box query = 8x8 corner region
    val grid = spark.range(64L * 64L).select(
      (col("id") / 64).cast("long").as("x"), (col("id") % 64).as("y"))
    def touched(laidOut: org.apache.spark.sql.DataFrame): Long = {
      val boxes = laidOut
        .groupBy(spark_partition_id().as("pid"))
        .agg(fmin($"x").as("x0"), fmax($"x").as("x1"),
          fmin($"y").as("y0"), fmax($"y").as("y1"))
      boxes.filter($"x1" >= 24 && $"x0" <= 31 && $"y1" >= 24 && $"y0" <= 31).count()
    }
    // 64 partitions of ~64 rows: under z-order a partition is ~one
    // aligned 8x8 tile, so the aligned 8x8 box lands in ~1 partition;
    // under linear (x, y) sort a partition is ~one x-column with full
    // y-extent, so the box's 8 x-columns touch ~8 partitions
    val z = touched(operators.Layout.zorderLayout(grid, 64, $"x", $"y"))
    val linear = touched(
      grid.repartitionByRange(64, $"x", $"y").sortWithinPartitions($"x", $"y"))
    assert(z < linear, s"zorder touched $z, linear $linear")
    assert(z <= 4, s"zorder should localize the box into few partitions, got $z")
  }

  test("segmentDedup: a doc losing every segment reassembles to the empty digest") {
    val shared = words("s", 20)
    val d = Seq(
      (1L, shared + " " + words("t", 10)),
      (2L, shared)
    ).toDF("doc_id", "text")
    val empty = spark.range(1)
      .select(md5(lit("").cast("binary"))).as[String].head()
    val got = ExtQueries.segmentDedup(d)
      .filter($"doc_id" === 2L)
      .select("n_kept", "clean_md5").as[(Long, String)].head()
    assert(got == ((0L, empty)), s"unexpected: $got")
  }
}
