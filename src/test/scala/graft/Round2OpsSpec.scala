package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, Multimodal, Similarity}

/** Edge paths of the round-2 operators: int8 quantization bounds and the
  * zero-vector guard, partitioning-invariance of digest sampling, the
  * PNG render→decode round trip, and the as-of null-time contract.
  */
class Round2OpsSpec extends SparkSpec {
  import spark.implicits._

  test("quantizeInt8: codes bounded, extremes hit ±127, zero vector total") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)), // max|x|=1.0 → codes (64, -127, 32)
      (2L, Seq(0.0f, 0.0f, 0.0f))    // zero vector → scale 1, codes 0
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df)
      .select(col("vec_id"), col("q"), col("scale"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Byte](1), r.getDouble(2))).toMap
    assert(out(1L)._1 == Seq[Byte](64, -127, 32))
    assert(math.abs(out(1L)._2 - 1.0 / 127.0) < 1e-15)
    assert(out(2L)._1 == Seq[Byte](0, 0, 0) && out(2L)._2 == 1.0)
  }

  test("textSentiment: signed sums, zero-hit docs neutral, label = sign") {
    val out = ExtQueries.textSentiment(spark, sfSmoke)
      .select("doc_id", "sentiment_score", "n_sentiment_words", "sentiment_label")
      .as[(Long, Long, Long, String)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, score, hits, label) =>
      val expected = if (score > 0) "positive" else if (score < 0) "negative" else "neutral"
      assert(label == expected, s"doc $id: score $score labeled $label")
      if (hits == 0) assert(score == 0, s"doc $id: no lexicon hits but score $score")
    }
    // the lexicon words appear throughout the corpus — both polarities
    // must actually occur, or the lexicon has drifted from the vocabulary
    val labels = out.map(_._4).toSet
    assert(labels.contains("positive") && labels.contains("negative"), labels.toString)
  }

  test("digest sampling & split are invariant under repartitioning") {
    val a = ExtQueries.pipelineTrainSplit(spark, sfSmoke)
      .collect().map(_.toString).sorted.toSeq
    val b = ExtQueries.pipelineTrainSplit(spark, sfSmoke)
      .repartition(13).collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
    val splits = a.map(_.split(",").last).toSet
    assert(Set("train]", "val]", "test]").subsetOf(splits))
  }

  test("renderWav → AudioSystem decode recovers the digest-contract shape") {
    val payload = "some audio-bearing document".getBytes("UTF-8")
    val wav = Multimodal.renderWav(payload)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    val expectedSamples = 800 + (hex.charAt(0).toInt % 8) * 400
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getSampleRate == 8000f)
    assert(ais.getFormat.getSampleSizeInBits == 16 && ais.getFormat.getChannels == 1)
    assert(ais.getFrameLength == expectedSamples)
    ais.close()
    // RIFF/WAVE magic — it really is a WAV container, not raw PCM
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
  }

  test("renderPng → ImageIO decode recovers the digest-contract dimensions") {
    val payload = "some document text".getBytes("UTF-8")
    val png = Multimodal.renderPng(payload)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    assert(img.getWidth == 64 + (hex.charAt(0).toInt % 8) * 16)
    assert(img.getHeight == 64 + (hex.charAt(1).toInt % 8) * 16)
  }

  test("as-of join drops null-time right rows instead of matching them") {
    val left = Seq((1L, "u", 100L)).toDF("id", "k", "t")
    val right = Seq(("u", Option.empty[Long], 99.0), ("u", Some(50L), 1.0))
      .toDF("k", "t", "v")
    val out = AsofJoin.backward(left, right,
      keyCols = Seq("k"), timeCol = "t", valueCols = Seq("v"))
      .select("id", "v").as[(Long, Double)].collect().toSeq
    // the null-time row (v=99.0) must never be the carried match
    assert(out == Seq((1L, 1.0)))
  }
}
