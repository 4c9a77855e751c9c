package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{AsofJoin, LatestPerKey, Similarity}

/** Degenerate-input behavior: empty inputs, all-null order keys, single
  * rows — operators must return empty/identity results, not throw.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  test("LatestPerKey: empty input -> empty; single row -> itself; null order keys survive") {
    val empty = Seq.empty[(Int, Int)].toDF("k", "v")
    assert(LatestPerKey(empty, Seq(col("k")), Seq(col("v").desc_nulls_last)).count() == 0)
    val one = Seq((1, 2)).toDF("k", "v")
    assert(LatestPerKey(one, Seq(col("k")), Seq(col("v").desc_nulls_last)).collect().toSeq
      == Seq(org.apache.spark.sql.Row(1, 2)))
    val nulls = Seq((1, Some(5)), (1, None), (2, None)).toDF("k", "v")
    val got = LatestPerKey(nulls, Seq(col("k")),
      Seq(col("v").desc_nulls_last, col("k").asc_nulls_first))
      .as[(Int, Option[Int])].collect().toMap
    assert(got == Map(1 -> Some(5), 2 -> None))
  }

  test("AsofJoin: empty right keeps all left rows with null values") {
    val left = Seq((1L, 10L, 100L)).toDF("lid", "k", "t")
    val right = Seq.empty[(Long, Long, Double)].toDF("k", "t", "v")
    val out = AsofJoin.backward(left, right, Seq("k"), "t", Seq("v"))
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(out.toSeq == Seq((1L, 10L, 100L, None)))
  }

  test("chunking + clustering degenerate docs: empty text, one word, exactly 8 words") {
    val out = ExtQueries.dedupClustersOf(
        Seq((1L, ""), (2L, "solo"), (3L, (1 to 8).map(i => s"e$i").mkString(" ")))
          .toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect()
    // every doc yields its chunk-0 vertex; none have shared 8-grams, so
    // each is its own singleton component (the empty doc chunks to [""])
    assert(out.sortBy(_._1).toSeq ==
      Seq((1L, 0L, 10000L), (2L, 0L, 20000L), (3L, 0L, 30000L)))
  }

  test("minhash_bands: single-shingle doc has a valid signature; null text path") {
    val out = Seq((1L, Some("a b c")), (2L, None))
      .toDF("doc_id", "text")
      .select(col("doc_id"), call_function("minhash_bands",
        array_distinct(TextFunctions.shingles(split(col("text"), " "), 3)),
        lit(16), lit(4)).as("mb"))
      .as[(Long, Option[Seq[String]])].collect().toMap
    val sig = out(1L).get
    assert(sig.length == 20 && sig.take(16).forall(_.length == 8)
      && sig.drop(16).forall(_.length == 32))
    assert(out(2L).isEmpty, "null text -> null split -> null bands")
  }

  test("kmv_distinct: all-null column -> 0.0; duplicates never inflate") {
    val allNull = Seq.fill(10)(Option.empty[String]).toDF("v")
    assert(allNull.agg(expr("kmv_distinct(v, 64)")).as[Double].head() == 0.0)
    val dups = Seq.fill(1000)("same").toDF("v")
    assert(dups.agg(expr("kmv_distinct(v, 64)")).as[Double].head() == 1.0)
  }

  test("connected components: self-loop edge and duplicate edges are harmless") {
    import graft.operators.ConnectedComponents
    val out = ConnectedComponents.labelPropagate(
        Seq(1L, 2L).toDF("id"),
        Seq(1L -> 1L, 1L -> 2L, 2L -> 1L, 1L -> 2L).toDF("src", "dst"), 2)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L))
  }

  test("similarity: empty query set -> empty result; zero vector -> NULL cosine ranks last") {
    val vecs = (0 until 10).map(i => (i.toLong, Seq.tabulate(4)(d => (i + d).toFloat)))
      .toDF("vec_id", "embedding")
    val emptyQ = vecs.filter(col("vec_id") < 0)
    assert(Similarity.bruteForceTopK(vecs, emptyQ, 3).count() == 0)
    // zero-norm vector: cosine_sim yields NULL (matching non-ANSI Divide
    // and DuckDB /0 semantics — NOT raw-Java NaN, which sorts greatest
    // under DESC and would make the zero vector every query's top hit);
    // desc_nulls_last ranks it after all real scores
    val withZero = vecs.unionByName(Seq((99L, Seq(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding"))
    val top = Similarity.bruteForceTopK(withZero, withZero.filter(col("vec_id") === 0), 3)
      .as[(Long, Long, Long, Double)].collect()
    assert(top.length == 3)
    assert(!top.exists(_._3 == 99L), "zero vector must not outrank real scores")
    val zeroCos = Seq((Seq(0f, 0f), Seq(1f, 2f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b"))).collect()(0)
    assert(zeroCos.isNullAt(0), "zero-norm cosine must be NULL, not NaN")
  }

  test("text functions: empty and single-word docs") {
    val df = Seq("", "word", "a b").toDF("text")
    val sh = df.select(size(TextFunctions.shingles(split(col("text"), " "), 3)).as("n"))
      .as[Int].collect().toSeq
    assert(sh == Seq(0, 0, 0))
    val rh = df.select(TextFunctions.rollingHash(col("text"))).as[Long].collect()
    assert(rh(0) == 0L) // empty fold
    val bpe = df.select(size(TextFunctions.bpeTokens(col("text")))).as[Int].collect().toSeq
    assert(bpe == Seq(0, 1, 2))
  }

  test("bloom semi-join: null keys never match; empty small side prunes everything") {
    import spark.implicits._
    val big = Seq((Some(1L), "a"), (None, "b"), (Some(99L), "c"))
      .toDF("id", "payload")
    val small = Seq(1L).toDF("sid")
    val got = graft.operators.BloomPrune.semiJoin(big, small, "id", "sid")
      .select("payload").as[String].collect().toSet
    assert(got == Set("a"), s"null/non-member keys must be pruned: $got")
    val empty = small.filter(col("sid") < 0)
    assert(graft.operators.BloomPrune.semiJoin(big, empty, "id", "sid").count() == 0)
  }

  test("range join: empty intervals side and out-of-range points yield empty") {
    import spark.implicits._
    val pts = Seq((1L, 100L)).toDF("pid", "t")
    val ivs = Seq((1L, 200L, 300L)).toDF("iid", "s", "e")
    assert(graft.operators.RangeJoin
      .pointInInterval(pts, "t", ivs.filter(col("iid") < 0), "s", "e", 64L).count() == 0)
    assert(graft.operators.RangeJoin
      .pointInInterval(pts, "t", ivs, "s", "e", 64L).count() == 0)
  }

  test("substringSpans: null text and whitespace-only docs are ignored") {
    import spark.implicits._
    val d = Seq((1L, Option("")), (2L, None), (3L, Option("   ")),
        (4L, Option((0 until 20).map(i => s"w$i").mkString(" "))))
      .toDF("doc_id", "text")
    assert(ExtQueries.substringSpans(d).count() == 0)
  }

  test("pq: corpus exactly ksub vectors encodes to self-codes; tiny query set works") {
    import spark.implicits._
    val df = (0 until 16).map(i =>
      (i.toLong, Seq.tabulate(16)(d => math.sin(i * 2.7 + d) * 3))).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooks(df, m = 4, ksub = 16)
    // every corpus vector IS a codeword per subspace -> its code must be
    // its own index (d2 = 0 beats every other codeword on these vectors)
    val packed = Similarity.pqEncode(df, cb).as[(Long, Long)].collect().toMap
    (0 until 16).foreach { i =>
      val expect = (0 until 4).map(j => i.toLong << (4 * j)).sum
      assert(packed(i.toLong) == expect, s"vector $i not self-coded: ${packed(i.toLong)}")
    }
    val topk = Similarity.pqTopK(df, df.filter(col("vec_id") === 0), k = 3)
    assert(topk.count() == 3)
  }

  test("kmv sketch: empty input -> empty sketch, estimate 0; merge of empties is empty") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("k")
    val sk = empty.agg(call_function("kmv_sketch", col("k"), lit(8))).head().getSeq[Long](0)
    assert(sk.isEmpty)
    val est = Seq(Tuple1(Seq.empty[Long])).toDF("sk")
      .agg(call_function("kmv_merge", col("sk"), lit(8)).as("m"))
      .select(ExtQueries.kmvEstimate(col("m"), 8)).head().getDouble(0)
    assert(est == 0.0)
  }
}
