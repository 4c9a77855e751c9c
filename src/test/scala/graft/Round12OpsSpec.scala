package graft

import org.apache.spark.sql.functions._

/** Round-12 ops: curation funnel, expectation suite, compaction
  * planner, tokenizer train→encode. (EntityResolutionSpec covers the
  * fuzzy-ER operator contract.)
  */
class Round12OpsSpec extends SparkSpec {

  test("pipelineCurationFunnel: stages chain, audit balances, every stage drops") {
    val rows = ExtQueries.pipelineCurationFunnel(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._2).toSeq ==
      Seq("lang_id", "quality", "decontaminate", "dedup_exact", "source_quota"))
    rows.foreach { case (no, stage, in, out, dropped) =>
      assert(in - out == dropped, s"stage $stage: audit does not balance")
      assert(out >= 0 && out <= in, s"stage $stage: survivors out of range")
    }
    // stages CHAIN: stage k's rows_in is stage k-1's rows_out
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 == b._3, s"${b._2}.rows_in != ${a._2}.rows_out")
    }
    // the fixture plants work for the stages that can bite at the smoke
    // SF; `quality` only drops short docs, which first appear at sf0.1
    // (the gated SFs exercise it — see the funnel's oracle runs)
    rows.filter(_._2 != "quality").foreach { case (_, stage, _, _, dropped) =>
      assert(dropped > 0, s"stage $stage dropped nothing (vacuous fixture)")
    }
  }

  test("qaExpectationSuite: six checks, exact ppm, planted range failure") {
    val rows = ExtQueries.qaExpectationSuite(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1)
    assert(rows.length == 6)
    rows.foreach { case (_, name, ppm, thr, passed) =>
      assert(ppm >= 0 && ppm <= 1000000, s"$name: ppm out of range")
      assert(passed == (ppm >= thr), s"$name: passed flag inconsistent")
    }
    // TPC-H-shaped data: completeness / uniqueness / domain / ref all hold
    assert(rows.filter(r => r._1 != 4).forall(_._5),
      "structural checks should pass on the generated tables")
    // the tight balance-range check must FAIL (negative balances exist)
    assert(!rows.find(_._1 == 4).get._5,
      "range_c_acctbal_0_9000 should fail — the suite must demonstrate failures")
  }

  test("layoutCompaction: bins respect partition boundaries and target size") {
    val rows = ExtQueries.layoutCompaction(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
    // pass-through files are exactly the >= target ones and get no bin
    rows.foreach { case (_, _, _, size, rewrite, bin) =>
      assert(rewrite == (size < 64))
      assert(bin.isDefined == rewrite, "bin iff rewrite")
    }
    assert(rows.exists(!_._5), "fixture must include pass-through files")
    assert(rows.exists(_._5), "fixture must include compacted files")
    // within each (day, bin): the greedy cumsum rule keeps bins near
    // target — total size < target + the largest member (no runaway bin)
    rows.filter(_._6.isDefined).groupBy(r => (r._1, r._6.get)).foreach {
      case ((day, bin), fs) =>
        val total = fs.map(_._4).sum
        val largest = fs.map(_._4).max
        assert(total < 64 + largest, s"day $day bin $bin overfull: $total")
    }
    // a bin never spans two day-partitions (grouping key includes day,
    // so assert the complement: same bin id may repeat across days but
    // files of one day never land in another day's bin — trivially true
    // by construction; instead check bins are dense from 0 per day
    rows.filter(_._6.isDefined).groupBy(_._1).foreach { case (day, fs) =>
      val bins = fs.map(_._6.get).distinct.sorted.toSeq
      assert(bins == (0L until bins.length).toSeq, s"day $day bins not dense")
    }
  }

  test("simHybridRrf: dense top-5, fusion arithmetic consistent, both-leg wins") {
    val rows = ExtQueries.simHybridRrf(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    // every query has exactly 5 fused results, ranks dense 1..5
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L), s"query $q ranks")
    }
    // rrf_fp is exactly the stated integer formula over present legs
    rows.foreach { case (q, _, c, fp, rl, rv) =>
      val expect = rl.map(r => 1000000L / (60 + r)).getOrElse(0L) +
        rv.map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(fp == expect, s"($q,$c): rrf_fp $fp != $expect")
      assert(rl.isDefined || rv.isDefined, "candidate from neither leg")
    }
    // fusion rewards agreement: some fused winner must come from BOTH legs
    assert(rows.exists(r => r._2 == 1 && r._5.isDefined && r._6.isDefined),
      "no rank-1 result backed by both legs — fusion degenerate")
  }

  test("pipelineMergeUpsert: per-action semantics and delete-by-absence") {
    val out = ExtQueries.pipelineMergeUpsert(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val target = graft.sources.Tables.load(spark, sfSmoke, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val (u, d, i) = (target.count(_ % 7 == 0), target.count(_ % 7 == 1),
      target.count(_ % 7 == 2))
    val byAction = out.groupBy(_._4).view.mapValues(_.length).toMap
    assert(byAction("updated") == u && byAction("inserted") == i)
    assert(byAction("kept") == target.length - u - d)
    // deletions prove themselves by absence
    assert(!out.exists(r => r._1 % 7 == 1 && r._1 < 8000000L), "deleted key survived")
    // inserts land in the new key space with the synthesized payload
    out.filter(_._4 == "inserted").foreach { r =>
      assert(r._1 >= 8000000L && r._2 == s"Inserted#${r._1}")
    }
    // updates moved the balance by exactly +100.00 fixed point
    val bal = graft.sources.Tables.load(spark, sfSmoke, "customer")
      .select(col("c_custkey"), expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.filter(_._4 == "updated").foreach { r =>
      assert(r._3 == bal(r._1) + 10000L, s"key ${r._1}: wrong updated balance")
    }
  }

  test("streamingExpectationSuite: ppm arithmetic exact, verdicts non-degenerate") {
    val rows = ExtQueries.streamingExpectationSuite(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (h, n, over, bad, passed) =>
      assert(n > 0, s"$h: empty window emitted")
      assert(over >= 0 && over <= 1000000 && bad >= 0 && bad <= 1000000)
      assert(passed == (bad == 0 && over <= 200000), s"$h: verdict inconsistent")
    }
    // the range rule must actually fire somewhere and pass somewhere
    assert(rows.exists(!_._5), "no failing window — range rule vacuous")
    assert(rows.exists(_._5), "no passing window")
  }

  test("textBpeTrainEncode equals the fixed-table encode (learned == shipped table)") {
    // BpeMerges was learned from the sf0.01 corpus by this exact loop,
    // so train->encode there must reproduce textBpeEncode bit-for-bit
    val dir = "/root/testdata/sf0.01"
    val trained = ExtQueries.textBpeTrainEncode(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap
    val fixed = ExtQueries.textBpeEncode(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(3)))).toMap
    assert(trained.keySet == fixed.keySet)
    trained.foreach { case (id, v) =>
      assert(v == fixed(id), s"doc $id: trained-table encode drifted")
    }
  }
}
