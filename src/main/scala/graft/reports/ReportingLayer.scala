package graft.reports

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ref._
import graft.operators.LatestPerKey
import graft.staging.StagingViews

/** The 3 business reports of `/root/reference/02_reporting_layer.sql`,
  * re-expressed Spark-first.
  *
  * Plan shape per report: filter accounts (filters push into the scan) →
  * LEFT joins against the 1-row-per-account contact views (no fanout) →
  * flag/sentinel projection → window dedup on `account_id`.
  *
  * Scale notes:
  *  - All joins and the dedup window hash-partition on the same key
  *    `account_id`, so `EnsureRequirements`/`ReuseExchange` plan ONE
  *    shuffle of the accounts side for the entire report.
  *  - The deduped contact views are orders of magnitude smaller than the
  *    raw activity log; AQE switches the joins to broadcast-hash when a
  *    side fits, which is the 100 TB analog of the reference's B-tree
  *    index (`01_staging_layer.sql:13-14`).
  *  - Report 2's `LEFT JOIN … WHERE r.contact_type='RESTRUCTURE'` is a
  *    null-rejecting filter (SURVEY.md §2 F7) — written here as the
  *    `left_semi` join Catalyst's `EliminateOuterJoin` would derive.
  */
object ReportingLayer {

  /** Output column lists (reference `02_reporting_layer.sql:100-118,194-212,277-290`). */
  val portfolioCols: Seq[String] = Seq(
    "company", "account_id", "account_checkdigit", "agent_type", "customer_name",
    "product_type", "risk_segment", "outstanding_balance", "agent_name",
    "operation_number", "contact_phone", "activity_notes", "contact_type",
    "last_activity_date", "field_visit_completed", "business_division",
    "customer_city", "coverage_area")

  val promisesCols: Seq[String] = Seq(
    "company", "account_id", "account_checkdigit", "customer_name", "agent_type",
    "risk_segment", "outstanding_balance", "collection_channel", "contact_type",
    "payment_promise_active", "promise_date", "contact_phone", "activity_notes")

  /** Primary-contact attachment shared by all 3 reports
    * (`02_reporting_layer.sql:48-60,141-153,232-249`): rename to avoid
    * collision with account columns, then sentinel/flag projection.
    */
  private def primarySlim(primary: DataFrame): DataFrame =
    primary.select(
      col("account_id"),
      col("phone_number").as("c_phone"),
      col("notes").as("c_notes"),
      col("contact_type").as("c_contact_type"),
      col("activity_date").as("c_activity_date"),
      col("collection_channel").as("c_collection_channel"))

  private def contactProjection: Seq[Column] = Seq(
    sentinel(col("c_phone")).as("contact_phone"),
    sentinel(col("c_notes")).as("activity_notes"),
    stripPriorityPrefix(col("c_contact_type")).as("contact_type"),
    sentinel(formatIsoDate(col("c_activity_date"))).as("last_activity_date"))

  private val accountCols: Seq[String] = Seq(
    "account_id", "account_checkdigit", "agent_type", "customer_name",
    "product_type", "risk_segment", "outstanding_balance", "agent_name",
    "operation_number", "business_division", "customer_city", "coverage_area")

  private def dedup(df: DataFrame, order: Seq[Column], tieCols: Seq[String]): DataFrame =
    LatestPerKey(df, Seq(col("account_id")),
      order ++ tieCols.map(c => col(c).asc_nulls_first))

  private def withCompany(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumn("company", lit("COMPANY_NAME")).select(cols.map(col): _*)

  /** Report 1 — Mortgage portfolio tracking (`02_reporting_layer.sql:37-120`). */
  def mortgagePortfolio(v: StagingViews, tieCols: Seq[String] = Nil): DataFrame = {
    val a = v.cleanAccounts.filter(
      col("product_type") === "MORTGAGE" &&
      col("business_division") === "RETAIL" &&
      col("containment_percentage") === 0)
    val fieldFlag = v.field.select(col("account_id"), lit(1).as("f_flag"))
    val joined = a
      .join(primarySlim(v.primary), Seq("account_id"), "left")
      .join(fieldFlag, Seq("account_id"), "left")
      .select(accountCols.map(col) ++ contactProjection :+
        existenceFlag(col("f_flag")).as("field_visit_completed"): _*)
    withCompany(
      dedup(joined, Seq(col("risk_segment").desc_nulls_last), tieCols),
      portfolioCols)
  }

  /** Report 2 — Restructuring pipeline (`02_reporting_layer.sql:130-214`).
    * The reference's LEFT JOIN + null-rejecting WHERE on the restructure
    * view keeps exactly the accounts with a restructure request — a semi
    * join (every restructure-view row has contact_type='RESTRUCTURE' by
    * construction, `01_staging_layer.sql:348`).
    */
  def restructuringPipeline(v: StagingViews, tieCols: Seq[String] = Nil): DataFrame = {
    val a = v.cleanAccounts.filter(
      col("business_division") === "RETAIL" &&
      col("containment_percentage") === 0)
      .join(v.restructure.filter(col("contact_type") === "RESTRUCTURE")
        .select("account_id"), Seq("account_id"), "left_semi")
    val fieldFlag = v.field.select(col("account_id"), lit(1).as("f_flag"))
    val joined = a
      .join(primarySlim(v.primary), Seq("account_id"), "left")
      .join(fieldFlag, Seq("account_id"), "left")
      .select(accountCols.map(col) ++ contactProjection :+
        existenceFlag(col("f_flag")).as("field_visit_completed"): _*)
    withCompany(
      dedup(joined,
        Seq(col("product_type").asc_nulls_first, col("risk_segment").desc_nulls_last),
        tieCols),
      portfolioCols)
  }

  /** Report 3 — Commercial loans with payment promises
    * (`02_reporting_layer.sql:224-292`). Keeps the promise join LEFT
    * because it also extracts `next_activity_date` for unmatched rows.
    */
  def commercialPromises(v: StagingViews, tieCols: Seq[String] = Nil): DataFrame = {
    val a = v.cleanAccounts.filter(
      col("business_division") === "RETAIL" &&
      col("containment_percentage") === 0 &&
      col("product_type") === "COMMERCIAL_LOAN")
    val promiseSlim = v.promise.select(
      col("account_id"), lit(1).as("p_flag"),
      col("next_activity_date").as("p_next_date"))
    val joined = a
      .join(primarySlim(v.primary), Seq("account_id"), "left")
      .join(promiseSlim, Seq("account_id"), "left")
      .select(
        col("account_id"), col("account_checkdigit"), col("customer_name"),
        col("agent_type"), col("risk_segment"), col("outstanding_balance"),
        col("operation_number"),
        sentinel(col("c_collection_channel")).as("collection_channel"),
        stripPriorityPrefix(col("c_contact_type")).as("contact_type"),
        existenceFlag(col("p_flag")).as("payment_promise_active"),
        sentinel(formatIsoDate(col("p_next_date")), "NO_PROMISE_DATE").as("promise_date"),
        sentinel(col("c_phone")).as("contact_phone"),
        sentinel(col("c_notes")).as("activity_notes"))
    withCompany(
      dedup(joined, Seq(col("risk_segment").desc_nulls_last), tieCols),
      promisesCols)
  }
}
