package graft

import org.apache.spark.sql.functions._
import graft.functions.ref

/** Unit tests for the reference expression library (SURVEY.md §2.2),
  * including the §7.4 risk cases: malformed dates → NULL, prefix
  * collation, sentinel behavior.
  */
class RefFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("parseDdMmYyyy: valid, malformed, empty, null") {
    val out = Seq("30/01/2024", "99/99/9999", "", "31/02/2024", "05/12/1999")
      .toDF("raw")
      .select(ref.parseDdMmYyyy(col("raw")).cast("string").as("d"))
      .as[String].collect().toSeq
    assert(out == Seq("2024-01-30", null, null, null, "1999-12-05"))
  }

  test("channelPriority covers the 5 channels + fallback") {
    val out = Seq("PHONE", "FIELD", "MESSAGING", "EMAIL", "AGENT_BANK", "FAX")
      .toDF("c").select(ref.channelPriority(col("c"))).as[String].collect().toSeq
    assert(out == Seq("01.PHONE", "02.FIELD", "03.MESSAGING", "04.EMAIL",
      "05.AGENT_BANK", "UNCLASSIFIED_CHANNEL"))
  }

  test("priority prefixes sort by business priority under binary collation") {
    val sorted = Seq("UNCLASSIFIED_CHANNEL", "02.FIELD", "01.PHONE", "05.AGENT_BANK").sorted
    assert(sorted == Seq("01.PHONE", "02.FIELD", "05.AGENT_BANK", "UNCLASSIFIED_CHANNEL"))
  }

  test("normalizeContactType branch order incl. AUTO_DIALER special case") {
    val rows = Seq(
      ("PRIMARY", "PHONE", "A1") -> "01.PRIMARY",
      ("RELATIVE", "PHONE", "A1") -> "02.THIRD_PARTY",
      ("NO_CONTACT", "PHONE", "AUTO_DIALER") -> "04.AUTO_DIALER",
      ("NO_CONTACT", "PHONE", "A1") -> "03.NO_CONTACT",
      ("GUARANTOR_NO_CONTACT", "PHONE", "A1") -> "GUARANTOR",
      ("SOMETHING", "FIELD", "A1") -> "FIELD",
      ("SOMETHING", "EMAIL", "A1") -> "EMAIL",
      ("SOMETHING", "CARRIER_PIGEON", "A1") -> "UNCLASSIFIED_CONTACT")
    val out = rows.map(_._1).toDF("ct", "ch", "an")
      .select(ref.normalizeContactType(col("ct"), col("ch"), col("an")))
      .as[String].collect().toSeq
    assert(out == rows.map(_._2))
  }

  test("stripPriorityPrefix round-trips report decode incl. NULL") {
    val out = Seq("01.PRIMARY", "02.THIRD_PARTY", "03.NO_CONTACT", "04.AUTO_DIALER",
      "GUARANTOR", null)
      .toDF("c").select(ref.stripPriorityPrefix(col("c"))).as[String].collect().toSeq
    assert(out == Seq("PRIMARY", "THIRD_PARTY", "NO_CONTACT", "AUTO_DIALER",
      "NO_CONTACT", "NO_CONTACT"))
  }

  test("coverageArea metro list") {
    val out = Seq("METRO_AREA_1", "METRO_AREA_3", "METRO_AREA_4", "RURAL_1")
      .toDF("c").select(ref.coverageArea(col("c"))).as[String].collect().toSeq
    assert(out == Seq("YES", "YES", "NO", "NO"))
  }

  test("sentinel + existenceFlag") {
    val out = Seq[(String, String)](("x", "k"), (null, null)).toDF("v", "k")
      .select(ref.sentinel(col("v")).as("s"), ref.existenceFlag(col("k")).as("f"))
      .as[(String, String)].collect().toSeq
    assert(out == Seq(("x", "YES"), ("NO_CONTACT", "NO")))
  }
}
