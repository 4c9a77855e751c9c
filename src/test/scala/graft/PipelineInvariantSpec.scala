package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

/** The reference's data-quality checks as executable assertions over the
  * derived sf0.001 pipeline (SURVEY.md §5.2 item 2; reference
  * `README.md:121-136`, `02_reporting_layer.sql:9-27`).
  */
class PipelineInvariantSpec extends SparkSpec {

  private lazy val v = Queries.stagedViews(spark, sfSmoke)

  test("every contact view is unique per account_id (row_num=1 invariant)") {
    Seq(
      "primary" -> v.primary, "field" -> v.field,
      "promise" -> v.promise, "restructure" -> v.restructure
    ).foreach { case (n, df) =>
      Quality.assertUniqueKey(df, col("account_id"), n)
      assert(Quality.duplicateKeys(df, col("account_id")).isEmpty, n)
    }
  }

  test("no NULL account keys anywhere") {
    (v.cleanAccounts +: Seq(v.primary, v.field, v.promise, v.restructure))
      .foreach(df => Quality.assertNoNullKey(df, col("account_id"), "view"))
  }

  test("left joins preserve all filtered accounts (reference README.md:20)") {
    val r1 = Queries.report1(spark, sfSmoke)
    val filtered = v.cleanAccounts.filter(
      col("product_type") === "MORTGAGE" &&
      col("business_division") === "RETAIL" &&
      col("containment_percentage") === 0)
    assert(r1.count() == filtered.select("account_id").distinct().count())
  }

  test("zero-activity accounts get NO_CONTACT sentinels") {
    val r1 = Queries.report1(spark, sfSmoke)
    val noContact = r1.filter(col("contact_type") === "NO_CONTACT" &&
      col("last_activity_date") === "NO_CONTACT")
    assert(noContact.count() > 0)
    // accounts beyond the activity id range (>=150) can have no contact
    assert(r1.filter(col("account_id").cast("int") >= 150 &&
      col("contact_phone") =!= "NO_CONTACT").count() == 0)
  }

  test("report dedup: one row per account, reports carry company literal") {
    Seq(
      Queries.report1(spark, sfSmoke),
      Queries.report2(spark, sfSmoke),
      Queries.report3(spark, sfSmoke)
    ).foreach { r =>
      Quality.assertUniqueKey(r, col("account_id"), "report")
      assert(r.select("company").distinct().collect().map(_.getString(0)).toSeq == Seq("COMPANY_NAME"))
    }
  }

  test("report2 only contains accounts with restructure requests") {
    val r2 = Queries.report2(spark, sfSmoke)
    val withRestructure = v.restructure.select("account_id").distinct()
    assert(r2.join(withRestructure, Seq("account_id"), "left_anti").count() == 0)
  }
}
