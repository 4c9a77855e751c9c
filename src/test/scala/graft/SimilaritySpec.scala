package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Similarity

/** Unit tests for the embedding-similarity and text-dedup primitives. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq(
      ("same", Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
      ("orth", Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
      ("anti", Seq(1f, 2f, 0f), Seq(-1f, -2f, 0f))
    ).toDF("name", "a", "b")
      .select(col("name"), round(Similarity.cosine(col("a"), col("b")), 9).as("cos"))
      .as[(String, Double)].collect().toMap
    assert(df("same") == 1.0 && df("orth") == 0.0 && df("anti") == -1.0)
  }

  test("bruteForceTopK: k rows per query, self excluded, rank ordered by score") {
    val vecs = (0 until 20).map(i =>
      (i.toLong, Seq.tabulate(8)(d => ((i * 7 + d * 3) % 11 - 5).toFloat))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") < 3), k = 4)
      .as[(Long, Long, Long, Double)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 4)
      assert(rows.forall(_._3 != q), "self must be excluded")
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._4).sliding(2).forall(p => p.head >= p.last), "scores descend with rank")
    }
  }

  test("lshTopK results are a subset of brute-force candidates with same scores") {
    val vecs = (0 until 50).map(i =>
      (i.toLong, Seq.tabulate(16)(d => math.sin(i * 1.7 + d).toFloat))).toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") % 10 === 0)
    val brute = Similarity.bruteForceTopK(vecs, q, k = 50)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap
    val approx = Similarity.lshTopK(vecs, q, k = 5, bands = 2, rowsPerBand = 2)
      .as[(Long, Long, Long, Double)].collect()
    assert(approx.nonEmpty)
    approx.foreach { case (qid, _, nid, score) =>
      assert(brute((qid, nid)) == score, "LSH score must equal exact score for the same pair")
    }
  }

  test("ivfTopK scores equal exact scores; top-1 recall is sane") {
    val vecs = (0 until 100).map(i =>
      (i.toLong, Seq.tabulate(16)(d => math.cos(i * 0.9 + d * 1.3).toFloat))).toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") % 20 === 0)
    val brute = Similarity.bruteForceTopK(vecs, q, k = 100)
      .as[(Long, Long, Long, Double)].collect()
    val bruteScores = brute.map(r => (r._1, r._3) -> r._4).toMap
    val bruteTop1 = brute.filter(_._2 == 1).map(r => r._1 -> r._3).toMap
    val ivf = Similarity.ivfTopK(vecs, q, k = 5, nlist = 4, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    ivf.foreach { case (qid, _, nid, score) =>
      assert(bruteScores((qid, nid)) == score, "IVF score must equal exact score")
    }
    // probing 2 of 4 lists should usually keep the true top-1
    val ivfTop1 = ivf.filter(_._2 == 1).map(r => r._1 -> r._3).toMap
    val recall = ivfTop1.count { case (qid, nid) => bruteTop1(qid) == nid }.toDouble / ivfTop1.size
    assert(recall >= 0.5, s"top-1 recall $recall suspiciously low")
  }

  test("nearDupPairs: every planted near-dup pair is found (banded recall)") {
    // 40 well-separated base vectors, each with a tiny-perturbed copy at
    // id+1000 — every (i, i+1000) pair has cosine ≈ 1 and must survive
    // the banded candidate generation (any one agreeing band suffices).
    val base = (0 until 40).map(i =>
      (i.toLong, Seq.tabulate(16)(d => math.sin(i * 1.7 + d * 0.9))))
    val pert = base.map { case (i, v) =>
      (i + 1000L, v.zipWithIndex.map { case (x, d) => x + (d % 3 - 1) * 0.001 }) }
    val df = (base ++ pert).toDF("vec_id", "embedding")
    val got = Similarity.nearDupPairs(df, threshold = 0.95)
      .select("id_1", "id_2").as[(Long, Long)].collect().toSet
    (0 until 40).foreach { i =>
      assert(got.contains((i.toLong, i + 1000L)), s"planted pair $i missed")
    }
  }

  test("nearDupPairs: degenerate hot bucket is capped, not expanded") {
    // 600 identical vectors land every one of their bands in the same
    // bucket (> cap 500) — all dropped from candidate generation, so the
    // clones yield NO pairs; a separated planted pair elsewhere survives.
    val clone = Seq.tabulate(16)(d => math.cos(d * 1.3))
    val clones = (0 until 600).map(i => (i.toLong, clone))
    val planted = Seq(
      (5000L, Seq.tabulate(16)(d => math.sin(d * 2.1) * 2 - 1)),
      (5001L, Seq.tabulate(16)(d => math.sin(d * 2.1) * 2 - 1 + (d % 3 - 1) * 0.001)))
    val df = (clones ++ planted).toDF("vec_id", "embedding")
    val got = Similarity.nearDupPairs(df, threshold = 0.95)
      .select("id_1", "id_2").as[(Long, Long)].collect().toSet
    assert(got.contains((5000L, 5001L)), "planted pair must survive")
    assert(got.forall { case (a, b) => a >= 5000L && b >= 5000L },
      s"clone pairs must be dropped by the bucket cap, got ${got.size} pairs")
  }

  test("simAnnRecall: floors on the near-random bench corpus hold") {
    // the regression floor the hash-match gate cannot provide — each
    // approximate query only matches its own oracle's identical
    // approximation, so a silent recall collapse would still hash-match.
    // The bench embeddings are near-random (exact top-5 cosine ≈ 0.33),
    // so ANY sublinear method's recall ≈ its candidate fraction; the
    // measured values are lsh 0.69 (56% candidates), ivf 0.45 (24%).
    // Floors sit just under those deterministic values — this is what
    // caught the single-signature LSH at 0.03 and the period-7
    // hyperplane-family bug.
    val recalls = ExtQueries.simAnnRecall(spark, sfSmoke)
      .groupBy("method").agg(avg("recall_at_5").as("mean_recall"))
      .as[(String, Double)].collect().toMap
    assert(recalls.keySet ==
      Set("lsh", "ivf", "pq", "ivfpq", "matryoshka", "int8", "ivf_append"))
    assert(recalls("lsh") >= 0.6, s"lsh mean recall@5 dropped to ${recalls("lsh")}")
    assert(recalls("ivf") >= 0.4, s"ivf mean recall@5 dropped to ${recalls("ivf")}")
    // the appended stored index is the same IVF probe structure with
    // k-means centroids trained on the corpus split only — frozen-
    // centroid assignment of the batch must not cost recall relative
    // to the ivf floor
    assert(recalls("ivf_append") >= 0.4,
      s"ivf_append mean recall@5 dropped to ${recalls("ivf_append")}")
    // int8 scores every vector — its only loss is rounding distortion,
    // which on near-random cosine spreads still ranks almost exactly
    assert(recalls("int8") >= 0.9, s"int8 mean recall@5 dropped to ${recalls("int8")}")
    // the 8/64-dim prefix keeps only ~1/8 of the signal on UNTRAINED
    // random vectors (real MRL embeddings concentrate signal in the
    // prefix; these can't) — measured 0.08 on this fixture, which IS
    // the prefix bound here; the floor guards against a collapse to
    // the 5/499 ≈ 0.01 random baseline (e.g. a broken slice)
    assert(recalls("matryoshka") >= 0.05,
      s"matryoshka mean recall@5 dropped to ${recalls("matryoshka")}")
    // PQ's loss is pure quantization DISTORTION (it scores every corpus
    // vector — no candidate pruning): 4 bits/subspace with the untrained
    // lowest-16-id codebook stand-in measures 0.18 on near-random
    // vectors, where quantization noise swamps the tiny cosine spreads.
    // The clustered-corpus test below is where PQ's real quality shows.
    assert(recalls("pq") >= 0.1, s"pq mean recall@5 dropped to ${recalls("pq")}")
  }

  test("clustered corpus: lsh and ivf recall@5 >= 0.8 where structure exists") {
    // 8 well-separated clusters × 30 near-identical members; bases get
    // ids 0..7 so ivfTopK's deterministic "centroids = lowest nlist ids"
    // coarse quantizer is exactly the cluster bases. On data with real
    // cluster structure (the case ANN exists for) both approximate paths
    // must be near-exhaustive.
    val bases = (0 until 8).map(c => Seq.tabulate(16)(d => math.sin(c * 2.1 + d * 1.7) * 2))
    val members = for { c <- 0 until 8; m <- 0 until 30 } yield
      (8 + c * 30 + m.toLong,
        bases(c).zipWithIndex.map { case (x, d) => x + ((m * 7 + d) % 5 - 2) * 0.01 })
    val df = (bases.zipWithIndex.map { case (v, c) => (c.toLong, v) } ++ members)
      .toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id").isin(8L, 38L, 68L, 98L, 128L, 158L, 188L, 218L))
    def pairs(res: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      res.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(df, queries, k = 5))
    val lsh = pairs(Similarity.lshTopK(df, queries, k = 5))
    val ivf = pairs(Similarity.ivfTopK(df, queries, k = 5))
    val lshRecall = (exact intersect lsh).size.toDouble / exact.size
    val ivfRecall = (exact intersect ivf).size.toDouble / exact.size
    assert(lshRecall >= 0.8, s"clustered lsh recall $lshRecall")
    assert(ivfRecall >= 0.8, s"clustered ivf recall $ivfRecall")
    // PQ's codebook stand-in (lowest 16 ids = the 8 cluster bases + 8
    // near-base members) quantizes every member close to its own
    // cluster's subvectors, so ADC ranking must recover the true
    // neighborhoods where cluster structure exists.
    val pq = pairs(Similarity.pqTopK(df, queries, k = 5, m = 8, ksub = 16))
    val pqRecall = (exact intersect pq).size.toDouble / exact.size
    assert(pqRecall >= 0.8, s"clustered pq recall $pqRecall")
    val ivfpq = pairs(Similarity.ivfPqTopK(df, queries, k = 5))
    val ivfpqRecall = (exact intersect ivfpq).size.toDouble / exact.size
    assert(ivfpqRecall >= 0.8, s"clustered ivfpq recall $ivfpqRecall")
  }

  test("pqEncode: packed codes equal a driver-computed argmin, nibble-packed") {
    // 12 deterministic 8-dim vectors, m=4 subspaces of 2 dims, codebook =
    // lowest 16... ksub must be <= corpus; use ksub=8 here (3-bit codes
    // still pack in 4-bit lanes). Expected codes computed in plain Scala
    // with the same left-fold d2 + strict-< first-min rule.
    val vecs = (0 until 24).map { i =>
      (i.toLong, Seq.tabulate(8)(d => math.cos(i * 1.3 + d * 0.7) * 3))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooks(df, m = 4, ksub = 8)
    assert(cb.length == 4 && cb.forall(_.length == 8) && cb.forall(_.forall(_.length == 2)))
    // driver reference: per subspace argmin of left-fold squared L2
    def code(v: Seq[Double], j: Int): Int = {
      val sub = v.slice(j * 2, j * 2 + 2)
      var best = -1; var bestD2 = 0.0
      for (c <- 0 until 8) {
        var acc = 0.0
        for (i <- 0 until 2) { val d = sub(i) - cb(j)(c)(i); acc += d * d }
        if (best < 0 || acc < bestD2) { best = c; bestD2 = acc }
      }
      best
    }
    val expected = vecs.map { case (id, v) =>
      id -> (0 until 4).map(j => code(v, j).toLong << (4 * j)).sum
    }.toMap
    val got = Similarity.pqEncode(df, cb)
      .as[(Long, Long)].collect().toMap
    assert(got == expected, s"packed codes diverge: ${got.toSeq.sorted} vs ${expected.toSeq.sorted}")
    // every nibble is a valid code
    assert(got.values.forall { p => (0 until 4).forall(j => ((p >> (4 * j)) & 15) < 8) })
  }

  test("native pq_adc_sum is bit-identical to the composed HOF fold") {
    // random-ish packed words + tables; doubleToLongBits equality, the
    // same contract as cosine_sim/nearest_centroid vs their HOF forms
    // flat row-major m×ksub tables (the layout the hot loop indexes)
    val rows = (0 until 50).map { i =>
      val packed = (0 until 8).map(j => ((i * 13 + j * 7) % 16).toLong << (4 * j)).sum
      val table = (for { j <- 0 until 8; c <- 0 until 16 }
        yield math.sin(i + j * 2.3 + c * 0.9) * 5).toSeq
      (packed, table)
    }
    val df = rows.toDF("packed", "lut")
    val got = df.select(
        call_function("pq_adc_sum", col("packed"), col("lut"), lit(16)).as("native"),
        Similarity.pqAdcSumHof("packed", "lut", 8, 16).as("hof"))
      .as[(Double, Double)].collect()
    got.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h),
        s"pq_adc_sum diverges: native=$n hof=$h")
    }
  }

  test("fused pq_adc_score is bit-identical to the composed pq_adc_sum form") {
    val n2 = (for { j <- 0 until 8; c <- 0 until 16 }
      yield math.abs(math.cos(j * 1.1 + c * 0.5)) + 0.1).toIndexedSeq
    val rows = (0 until 40).map { i =>
      val packed = (0 until 8).map(j => ((i * 11 + j * 5) % 16).toLong << (4 * j)).sum
      val lut = (for { j <- 0 until 8; c <- 0 until 16 }
        yield math.sin(i + j * 1.7 + c * 0.4) * 3).toSeq
      val qnorm = 0.5 + (i % 7) * 0.3
      (packed, lut, qnorm)
    }
    val df = rows.toDF("packed", "lut", "q_norm")
    val got = df.select(
        call_function("pq_adc_score", col("packed"), col("lut"), col("q_norm"),
          typedLit(n2), lit(16)).as("fused"),
        (call_function("pq_adc_sum", col("packed"), col("lut"), lit(16)) /
          (col("q_norm") * sqrt(call_function("pq_adc_sum", col("packed"),
            typedLit(n2), lit(16))))).as("composed"))
      .as[(Double, Double)].collect()
    got.foreach { case (f, c) =>
      assert(java.lang.Double.doubleToLongBits(f) == java.lang.Double.doubleToLongBits(c),
        s"pq_adc_score diverges: fused=$f composed=$c")
    }
  }

  test("native pq_lut is bit-identical to the composed HOF dot table") {
    val cb = IndexedSeq.tabulate(4, 8)((j, c) =>
      Array.tabulate(4)(i => math.cos(j * 1.9 + c * 0.8 + i * 0.3) * 2)).map(_.toIndexedSeq)
    val df = (0 until 30).map(i => Tuple1(Seq.tabulate(16)(d => math.sin(i * 0.9 + d) * 3)))
      .toDF("q_vec")
      .select(expr("transform(q_vec, x -> CAST(x AS DOUBLE))").as("q_vec"))
    val got = df.select(
        call_function("pq_lut", col("q_vec"),
          typedLit(cb.map(_.map(_.toIndexedSeq)))).as("native"),
        Similarity.pqLutHof(col("q_vec"), cb).as("hof"))
      .as[(Seq[Double], Seq[Double])].collect()
    got.foreach { case (n, h) =>
      assert(n.map(java.lang.Double.doubleToLongBits) ==
             h.map(java.lang.Double.doubleToLongBits),
        s"pq_lut diverges: $n vs $h")
    }
  }

  test("pqTopK is deterministic across runs and repartitionings") {
    val base = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
    val q = base.filter(col("vec_id") % 25 === 0)
    val a = Similarity.pqTopK(base, q, k = 5).collect().toSeq
    val b = Similarity.pqTopK(base.repartition(7), q, k = 5).collect().toSeq
    assert(a.toSet == b.toSet && a.size == b.size)
  }

  test("minhash signature similarity: identical sets → 1.0; disjoint → low") {
    val df = Seq(
      ("a b c d e f g h", "a b c d e f g h"),
      ("a b c d e f g h", "q r s t u v w x")
    ).toDF("t1", "t2")
      .select(
        TextFunctions.signatureSimilarity(
          TextFunctions.minhashSignature(TextFunctions.shingles(split(col("t1"), " "), 3), 16),
          TextFunctions.minhashSignature(TextFunctions.shingles(split(col("t2"), " "), 3), 16),
          16).as("sim"))
      .as[Double].collect()
    assert(df(0) == 1.0)
    assert(df(1) < 0.3)
  }

  test("simhash: equal docs → hamming 0; near-dup docs → small hamming") {
    val words = "the quick brown fox jumps over the lazy dog again and again today"
    val near = words.split(" ").drop(2).mkString(" ")
    val far = "zz yy xx ww vv uu tt ss rr qq pp oo nn"
    val sims = Seq(words, near, far).toDF("text")
      .select(TextFunctions.simhash16(split(col("text"), " ")).as("sh"))
      .as[String].collect()
    def ham(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    assert(ham(sims(0), sims(0)) == 0)
    assert(ham(sims(0), sims(1)) <= 4, s"near dup should be close: ${sims(0)} vs ${sims(1)}")
    assert(ham(sims(0), sims(2)) >= 3, "unrelated docs should differ")
  }

  test("rolling hash matches a local fold and ignores nothing") {
    val texts = Seq("hello world", "", "a")
    val got = texts.toDF("text")
      .select(TextFunctions.rollingHash(col("text")).as("h")).as[Long].collect()
    val expected = texts.map(_.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L))
    assert(got.toSeq == expected)
  }

  test("native cosine_sim is bit-identical to the composed HOF cosine") {
    val vecs = (0 until 200).map(i =>
      (i.toLong, Seq.tabulate(64)(d => (math.sin(i * 2.3 + d * 0.7) * 3).toFloat)))
      .toDF("vec_id", "embedding")
    val both = vecs.as("a").crossJoin(vecs.limit(5).as("b"))
      .select(
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("native"),
        Similarity.cosineHof(col("a.embedding"), col("b.embedding")).as("hof"))
      .as[(Double, Double)].collect()
    assert(both.length == 1000)
    both.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h))
    }
    // length mismatch -> null, mirroring zip_with padding semantics
    val m = Seq((Seq(1f, 2f), Seq(1f, 2f, 3f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b"))).collect()(0)
    assert(m.isNullAt(0))
  }

  test("native hyperplane_bands is bit-identical to the composed HOF form") {
    // positives, negatives, zeros, zero vector, varying magnitudes —
    // every band key must match the HOF fold exactly (the oracle mirrors
    // the HOF shape, so this equivalence IS the gate's soundness)
    val vecs = ((0 until 200).map(i =>
      (i.toLong, Seq.tabulate(64)(d => (math.sin(i * 2.3 + d * 0.7) * 3).toFloat))) :+
      (999L, Seq.fill(64)(0f)))            // zero vector: all projections 0.0 → all bits '1'
      .toDF("vec_id", "embedding")
    for ((b, r) <- Seq((8, 3), (4, 4), (2, 2), (1, 1))) {
      val rows = vecs.select(
        Similarity.hyperplaneBands(col("embedding"), b, r).as("native"),
        Similarity.hyperplaneBandsHof(col("embedding"), b, r).as("hof"))
        .as[(Seq[String], Seq[String])].collect()
      rows.foreach { case (n, h) => assert(n == h, s"bands=$b rows=$r") }
    }
    // empty vector → NULL keys (no signature; the row drops out of
    // banding when the key array explodes) — the HOF's all-'0' keys on
    // empties are a sequence(1,0)-descending artifact, and the oracle's
    // init-less list_reduce errors, so null is the defined behavior
    val empty = Seq((1L, Seq.empty[Float])).toDF("vec_id", "embedding")
      .select(Similarity.hyperplaneBands(col("embedding"), 4, 2)).collect()(0)
    assert(empty.isNullAt(0))
    // addressable from SQL text through the extension registration
    vecs.createOrReplaceTempView("hb_in")
    val viaSql = spark.sql(
      "SELECT hyperplane_bands(embedding, 2, 3) FROM hb_in WHERE vec_id = 0")
      .as[Seq[String]].head()
    assert(viaSql.length == 2 && viaSql.forall(_.length == 5))
  }

  test("vec_sum custom aggregate sums long arrays element-wise") {
    val df = Seq((1, Seq(1L, 2L, 3L)), (1, Seq(10L, 20L, 30L)), (2, Seq(5L, 5L, 5L)))
      .toDF("k", "v")
    val got = df.groupBy("k").agg(expr("vec_sum(v)").as("s"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(got(1) == Seq(11L, 22L, 33L) && got(2) == Seq(5L, 5L, 5L))
    // also addressable from pure SQL via the extension registration
    df.createOrReplaceTempView("vecsum_in")
    val sql = spark.sql("SELECT k, vec_sum(v) AS s FROM vecsum_in GROUP BY k")
      .as[(Int, Seq[Long])].collect().toMap
    assert(sql == got)
  }

  test("bpe tokens split letter runs, digit runs, punctuation") {
    val out = Seq("abc12 de! x9").toDF("text")
      .select(TextFunctions.bpeTokens(col("text")).as("t")).as[Seq[String]].head()
    assert(out == Seq("abc", "12", "de", "!", "x", "9"))
  }
}
