package graft

import org.apache.spark.sql.functions._

/** Unit fixtures for the round-3 operators: repetition fractions on
  * hand-computable docs, PII redaction hit/no-hit paths, and the
  * per-source quota sample's cap + determinism.
  */
class Round3OpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionSignals: hand-computed duplicate fractions") {
    // "a a a b": tokens 4 distinct 2 -> dup 0.5
    //   bigrams [a a, a a, a b]: 3 distinct 2 -> dup 1/3
    //   trigrams [a a a, a a b]: 2 distinct 2 -> dup 0.0
    // "x y z": all distinct -> 0.0 everywhere
    val out = ExtQueries.repetitionSignals(
        Seq((1L, "a a a b"), (2L, "x y z")).toDF("doc_id", "text"))
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 4L, 0.5, 1.0 - 2.0 / 3.0, 0.0)))
    assert(out(2L) == ((2L, 3L, 0.0, 0.0, 0.0)))
  }

  test("repetitionSignals: docs shorter than the n-gram width get 0 fractions") {
    val out = ExtQueries.repetitionSignals(
        Seq((1L, "solo"), (2L, "two words")).toDF("doc_id", "text"))
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 1L, 0.0, 0.0, 0.0)))
    assert(out(2L) == ((2L, 2L, 0.0, 0.0, 0.0)))
  }

  test("piiRedact: injected docs count+redact both patterns, others untouched") {
    val out = ExtQueries.piiRedactOf(
        Seq((5L, "hello world"), (7L, "plain text")).toDF("doc_id", "text"))
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(5L)._2 == 1 && out(5L)._3 == 1, "doc 5 must count 1 email + 1 phone")
    assert(out(7L)._2 == 0 && out(7L)._3 == 0)
    // the no-hit doc's digest is the digest of its unchanged text
    val plainMd5 = Seq("plain text").toDF("t")
      .select(md5(col("t").cast("binary"))).as[String].head()
    assert(out(7L)._4 == plainMd5)
    // the redacted doc's digest matches the explicit replacement
    val redactedMd5 = Seq("hello world contact <EMAIL> or <PHONE>").toDF("t")
      .select(md5(col("t").cast("binary"))).as[String].head()
    assert(out(5L)._4 == redactedMd5,
      "email+phone must be replaced by <EMAIL>/<PHONE> placeholders")
  }

  test("textTfidfTopK: rare terms outrank common ones; ranking is total") {
    val out = ExtQueries.textTfidfTopK(spark, sfSmoke)
      .as[(Long, Long, String, Long, Long, Double)].collect()
    val byDoc = out.groupBy(_._1)
    assert(byDoc.values.forall(_.length <= 3))
    byDoc.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      // scores non-increasing with rank; rank ties impossible (word asc)
      assert(sorted.map(_._6).sliding(2).forall(p => p.length < 2 || p.head >= p.last))
    }
    // a term appearing in every doc can never beat a same-tf rarer term
    out.foreach { case (_, _, _, tf, df, score) =>
      assert(score > 0 && df > 0 && tf > 0)
    }
  }

  test("textDecontaminate: planted 8-gram overlap is flagged, benchmark excluded") {
    val out = ExtQueries.textDecontaminate(spark, sfSmoke)
      .as[(Long, Long, Boolean)].collect()
    assert(out.nonEmpty)
    // benchmark docs (doc_id % 50 == 0) never appear in the report
    assert(out.forall(_._1 % 50 != 0))
    // flag consistent with count
    assert(out.forall { case (_, n, c) => c == (n > 0) })
  }

  test("packSequences: fractional-packing invariant per group") {
    val out = ExtQueries.packSequences(spark, sfSmoke)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._2).foreach { case (grp, rows) =>
      val bins = rows.map(_._3)
      assert(bins.min == 0, s"group $grp bins must start at 0")
      // exclusive-cumsum binning: all bins below the last are "full" —
      // the docs assigned to bins 0..b cover at least b*512 tokens
      val byBin = rows.groupBy(_._3).view.mapValues(_.map(_._4).sum).toMap
      (0L until bins.max).foreach { b =>
        val below = (0L to b).map(byBin.getOrElse(_, 0L)).sum
        assert(below >= (b + 1) * 512 - 511,
          s"group $grp: bins 0..$b hold only $below tokens")
      }
    }
  }

  test("mixUpsample: copies per doc equal its weight, weights in 1..3") {
    val out = ExtQueries.mixUpsample(spark, sfSmoke)
      .as[(Long, String, Long, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (doc, rows) =>
      val w = rows.head._3
      assert(w >= 1 && w <= 3)
      assert(rows.length == w, s"doc $doc: ${rows.length} copies for weight $w")
      assert(rows.map(_._4).sorted.toSeq == (1L to w), s"doc $doc copy indices")
    }
  }

  test("sampleSourceQuota: exactly 10 per source, deterministic, digest-ranked") {
    val a = ExtQueries.sampleSourceQuota(spark, sfSmoke).collect()
    val bySource = a.groupBy(_.getString(0))
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rows) =>
      assert(rows.length == 10, s"source $src got ${rows.length} rows")
      val digests = rows.sortBy(_.getLong(1)).map(_.getString(3)).toSeq
      assert(digests == digests.sorted, s"source $src not digest-ordered")
    }
    val b = ExtQueries.sampleSourceQuota(spark, sfSmoke).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
  }
}
