package graft.staging

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ref._
import graft.operators.LatestPerKey

/** The 5 staged views of the reference's staging layer
  * (`/root/reference/01_staging_layer.sql`), re-expressed as lazy
  * `DataFrame` pipelines. Like the reference's non-materialized views
  * (`README.md:116`), nothing here runs a job — each view is a logical
  * plan that Catalyst inlines, pushes filters through, and prunes columns
  * across (SURVEY.md §4).
  *
  * Scale notes:
  *  - The 4 activity-derived views each carry a different source filter
  *    (`collection_channel='FIELD'`, `contact_outcome='PAYMENT_PROMISE'`,
  *    …) which pushes down to the Parquet scan — at 100 TB that is the
  *    difference between scanning the full activity log 4× and scanning
  *    1× + three thin filtered scans.
  *  - Every view dedups on `account_id` via [[LatestPerKey]]; the
  *    `row_number=1` filter becomes `WindowGroupLimit` (partial top-1
  *    before the shuffle).
  *
  * @param tieCols extra raw columns appended (ascending) to every window
  *        order as a deterministic tie-breaker — mandatory for the oracle
  *        hash-match gate (SURVEY.md §7.4 item 1). They must exist in the
  *        activities input and are dropped from view output.
  */
object StagingLayer {

  /** Pass-through contact columns (reference `01_staging_layer.sql:98-105`). */
  val contactCols: Seq[String] = Seq(
    "contact_outcome", "non_payment_reason", "contact_location",
    "next_action", "notes", "phone_number", "department", "agent_name")

  /** Output schema of every contact view (reference `01_staging_layer.sql:130-144`). */
  val viewCols: Seq[String] = Seq(
    "account_id", "activity_date", "activity_time", "next_activity_date",
    "collection_channel", "contact_type") ++ contactCols

  /** View 1 — clean_accounts (`01_staging_layer.sql:25-44`): pass-through
    * projection + metro coverage flag. No dedup at staging level by design
    * ("multiple operations per account", reference `README.md:51`).
    */
  def cleanAccounts(accounts: DataFrame): DataFrame =
    accounts.withColumn("coverage_area", coverageArea(col("customer_city")))

  /** Shared contact_preprocessing CTE shape (`01_staging_layer.sql:60-107`). */
  private def preprocess(
      activities: DataFrame,
      channel: Column,
      ctype: Column,
      tieCols: Seq[String]): DataFrame =
    activities.select(
      Seq(
        col("account_id"),
        parseDdMmYyyy(col("activity_date")).as("activity_date"),
        col("activity_time"),
        parseDdMmYyyy(col("next_activity_date")).as("next_activity_date"),
        channel.as("collection_channel"),
        ctype.as("contact_type")
      ) ++ contactCols.map(col) ++ tieCols.map(col): _*)

  private def dedupToView(pre: DataFrame, order: Seq[Column], tieCols: Seq[String]): DataFrame =
    LatestPerKey(
      pre,
      Seq(col("account_id")),
      order ++ tieCols.map(c => col(c).asc_nulls_first)
    ).select(viewCols.map(col): _*)

  /** Primary-contact preprocessing without the dedup — public so the
    * STREAMING staging mode can apply the identical expressions and do
    * its latest-per-key in keyed state instead of a window.
    */
  def preprocessPrimary(activities: DataFrame, extraCols: Seq[String] = Nil): DataFrame =
    preprocess(
      activities,
      channelPriority(col("collection_channel")),
      normalizeContactType(col("contact_type"), col("collection_channel"), col("agent_name")),
      extraCols)

  /** Business-priority-then-recency order of the primary view (shared by
    * the batch, incremental, and streaming formulations so they cannot
    * drift).
    */
  private def primaryOrder: Seq[Column] = Seq(
    col("collection_channel").asc_nulls_first,
    col("contact_type").asc_nulls_first,
    col("activity_date").desc_nulls_last)

  /** View 2 — clean_contacts_primary (`01_staging_layer.sql:59-146`):
    * latest relevant contact per account; priority prefix makes
    * (channel ASC, type ASC) a business-priority sort, then recency.
    */
  def cleanContactsPrimary(activities: DataFrame, tieCols: Seq[String] = Nil): DataFrame =
    dedupToView(preprocessPrimary(activities, tieCols), primaryOrder, tieCols)

  // ===== incremental batch staging (the MERGE/upsert form of view 2) =====
  //
  // The state row set keeps the ranking + tie columns that the published
  // view drops, so a later batch can rank old vs new rows under the
  // IDENTICAL total order. Top-1 per key under a total order is an
  // associative tournament, so folding daily batches in any grouping is
  // exactly the full recompute — verified by the
  // `pipeline_incremental_primary` oracle gate, whose twin is the SAME
  // SQL as the batch view. At 100 TB each increment shuffles only
  // |state| + |delta| (one best row per account + the new batch), never
  // rescanning the activity history.

  /** Initial incremental state from a history batch: one best row per
    * account, ranking columns retained.
    */
  def primaryState(activities: DataFrame, tieCols: Seq[String]): DataFrame =
    LatestPerKey(
      preprocessPrimary(activities, tieCols),
      Seq(col("account_id")),
      primaryOrder ++ tieCols.map(c => col(c).asc_nulls_first))

  /** Fold one new raw-activity batch into the state (same shape in and
    * out, so increments chain).
    */
  def incrementPrimary(state: DataFrame, newActivities: DataFrame,
                       tieCols: Seq[String]): DataFrame =
    LatestPerKey(
      state.unionByName(preprocessPrimary(newActivities, tieCols)),
      Seq(col("account_id")),
      primaryOrder ++ tieCols.map(c => col(c).asc_nulls_first))

  /** Publish the incremental state as the view schema. */
  def stateToView(state: DataFrame): DataFrame = state.select(viewCols.map(col): _*)

  /** View 3 — clean_contacts_field (`01_staging_layer.sql:157-230`):
    * latest field visit per account (source filter pushes to the scan).
    */
  def cleanContactsField(activities: DataFrame, tieCols: Seq[String] = Nil): DataFrame = {
    val pre = preprocess(
      activities.filter(col("collection_channel") === "FIELD"),
      lit("02.FIELD"),
      normalizeContactTypeField(col("contact_type"), col("agent_name")),
      tieCols)
    dedupToView(pre, Seq(
      col("contact_type").asc_nulls_first,
      col("activity_date").desc_nulls_last), tieCols)
  }

  /** View 4 — clean_contacts_promise (`01_staging_layer.sql:241-314`):
    * latest payment promise per account, pure recency order.
    */
  def cleanContactsPromise(activities: DataFrame, tieCols: Seq[String] = Nil): DataFrame = {
    val pre = preprocess(
      activities.filter(col("contact_outcome") === "PAYMENT_PROMISE"),
      channelPriority(col("collection_channel")),
      lit("PROMISE"),
      tieCols)
    dedupToView(pre, Seq(
      col("activity_date").desc_nulls_last,
      col("activity_time").desc_nulls_last), tieCols)
  }

  /** View 5 — clean_contacts_restructure (`01_staging_layer.sql:325-398`). */
  def cleanContactsRestructure(activities: DataFrame, tieCols: Seq[String] = Nil): DataFrame = {
    val pre = preprocess(
      activities.filter(col("contact_outcome") === "RESTRUCTURE_REQUEST"),
      channelPriority(col("collection_channel")),
      lit("RESTRUCTURE"),
      tieCols)
    dedupToView(pre, Seq(
      col("activity_date").desc_nulls_last,
      col("activity_time").desc_nulls_last), tieCols)
  }

  /** All 5 views, also registered as temp views (idempotent replace —
    * the `DROP VIEW IF EXISTS` + `CREATE VIEW` pair, SURVEY.md §2 S4/S5)
    * so `spark.sql` reaches the identical plans.
    */
  def build(
      spark: SparkSession,
      accounts: DataFrame,
      activities: DataFrame,
      tieCols: Seq[String] = Nil): StagingViews = {
    val v = StagingViews(
      cleanAccounts = cleanAccounts(accounts),
      primary = cleanContactsPrimary(activities, tieCols),
      field = cleanContactsField(activities, tieCols),
      promise = cleanContactsPromise(activities, tieCols),
      restructure = cleanContactsRestructure(activities, tieCols))
    v.cleanAccounts.createOrReplaceTempView("clean_accounts")
    v.primary.createOrReplaceTempView("clean_contacts_primary")
    v.field.createOrReplaceTempView("clean_contacts_field")
    v.promise.createOrReplaceTempView("clean_contacts_promise")
    v.restructure.createOrReplaceTempView("clean_contacts_restructure")
    v
  }
}

/** Handle on the 5 staged views (reference `01_staging_layer.sql`). */
final case class StagingViews(
    cleanAccounts: DataFrame,
    primary: DataFrame,
    field: DataFrame,
    promise: DataFrame,
    restructure: DataFrame)
