package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.BpeTrainer

/** The iterated BPE training loop (driver r8): the learned table must
  * reproduce the shipped fixture (which was trained exactly this way),
  * later rounds must consume earlier rounds' outputs, and the trainer
  * must reject corpora whose statistics break the replace-chain
  * encoding's precondition.
  */
class BpeTrainerSpec extends SparkSpec {

  private def corpusWords(dir: String = sfSmoke) = ExtQueries.docs(spark, dir)
    .select(explode(split(col("text"), " ")).as("w"))
    .filter(length(col("w")) >= 2)

  test("training reproduces the shipped BpeMerges fixture, in rank order") {
    // the fixture's provenance corpus is sf0.01 (TextFunctions.BpeMerges
    // scaladoc); sf0.001 is a different 500-doc sample with a different
    // learned table
    val learned = BpeTrainer.train(corpusWords("/root/testdata/sf0.01"), rounds = 10)
    assert(learned.map(t => (t._1, t._2)) == TextFunctions.BpeMerges,
      s"learned table diverged from the fixture: $learned")
    // counts are monotone non-increasing ONLY within a symbol level;
    // what must hold globally: every adopted pair was counted > 0
    assert(learned.forall(_._3 > 0))
  }

  test("later rounds consume earlier rounds' merged symbols (multi-level BPE)") {
    val learned = BpeTrainer.train(corpusWords(), rounds = 10).map(t => (t._1, t._2))
    val multiLevel = learned.zipWithIndex.filter { case ((a, b), i) =>
      val earlier = learned.take(i).map { case (x, y) => x + y }
      earlier.contains(a) || earlier.contains(b)
    }
    assert(multiLevel.nonEmpty,
      "no learned merge consumes an earlier merge's output — the loop " +
        "degenerated to independent bigram counts")
  }

  test("ties break to the lexicographically smallest pair") {
    import spark.implicits._
    // 'ab' and 'cd' both appear twice; (a,b) < (c,d)
    val words = Seq("ab", "ab", "cd", "cd").toDF("w")
    val learned = BpeTrainer.train(words, rounds = 1)
    assert(learned.head._1 == "a" && learned.head._2 == "b")
  }

  test("a corpus that learns a precondition-violating table fails loudly") {
    import spark.implicits._
    // round 1 learns (b,c) [freq 3]; round 2 learns (a,b) [freq 2] —
    // 'b' is a proper prefix of the earlier merged symbol 'bc', which
    // validateMerges must reject after training
    val words = Seq("bc", "bc", "bc", "abx", "abx").toDF("w")
    val e = intercept[IllegalArgumentException] {
      BpeTrainer.train(words, rounds = 2)
    }
    assert(e.getMessage.contains("proper prefix"))
  }
}
