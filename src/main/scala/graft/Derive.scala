package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deterministic mapping from the driver's TPC-H-ish testdata (TESTDATA.md)
  * to the reference's raw input shape (`stg_accounts` / `stg_activities`,
  * FIXTURES.md). Defined twice — as Spark expressions here and as the
  * textually-equivalent DuckDB SQL in [[DeriveSql]] — so the ENTIRE
  * reference pipeline (staging views + reports) runs under the driver's
  * DuckDB hash-match gate on the same inputs.
  *
  * The mapping reproduces every fixture edge case from FIXTURES.md §3:
  *  - accounts with zero activities (custkey 0–1499 vs user_id 0–149);
  *  - multiple operations per account (orders per custkey ≈ 10);
  *  - malformed DD/MM/YYYY dates (every 19th event → '99/99/9999');
  *  - NULL phone/notes for the COALESCE sentinel paths;
  *  - out-of-domain channel ('CARRIER_PIGEON') and contact types
  *    ('UNKNOWN_TYPE', 'ESCALATION') for the ELSE branches;
  *  - 'AUTO_DIALER' agent rows for the NO_CONTACT+AUTO_DIALER branch.
  *
  * `src_seq` (= event_id) rides along as the deterministic window
  * tie-breaker (SURVEY.md §7.4 item 1); staging drops it from view output.
  */
object Derive {

  /** stg_accounts derived from `orders` (account_id = custkey ⇒ multiple
    * operations per account, reference `README.md:51`).
    */
  def stgAccounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders").select(
      lit("ACME_COLLECTIONS").as("collection_company"),
      col("o_custkey").cast("string").as("account_id"),
      (col("o_orderkey") % 10).cast("string").as("account_checkdigit"),
      when(col("o_orderkey") % 3 === 0, "INTERNAL").otherwise("EXTERNAL").as("agent_type"),
      concat(lit("CUST_"), col("o_custkey").cast("string")).as("customer_name"),
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "MORTGAGE")
        .when(col("o_orderpriority") === "3-MEDIUM", "COMMERCIAL_LOAN")
        .otherwise("CONSUMER_LOAN").as("product_type"),
      concat(lit("SEG_"), (col("o_orderkey") % 5).cast("string")).as("risk_segment"),
      col("o_totalprice").as("outstanding_balance"),
      concat(lit("AGENT_"), (col("o_orderkey") % 7).cast("string")).as("agent_name"),
      col("o_orderkey").cast("string").as("operation_number"),
      when(col("o_orderkey") % 4 === 0, 25.5).otherwise(0.0).as("containment_percentage"),
      when(col("o_orderstatus") === "F", "COMMERCIAL").otherwise("RETAIL").as("business_division"),
      concat(lit("METRO_AREA_"), (col("o_custkey") % 5).cast("string")).as("customer_city"))

  /** stg_activities derived from `events` (account_id = user_id; dates are
    * raw DD/MM/YYYY text exactly as the reference ingests them,
    * `README.md:118`). Carries `src_seq` for deterministic tie-breaking.
    */
  def stgActivities(spark: SparkSession, dir: String): DataFrame =
    activitiesFrom(Tables.events(spark, dir))

  /** The same projection over any events-shaped input (batch table or
    * stream); `extraCols` are appended verbatim (e.g. `ts` so a stream
    * keeps its watermark column).
    */
  def activitiesFrom(events: DataFrame, extraCols: Seq[String] = Nil): DataFrame =
    events.select(Seq(
      col("user_id").cast("string").as("account_id"),
      when(col("event_id") % 19 === 0, "99/99/9999")
        .otherwise(date_format(col("ts"), "dd/MM/yyyy")).as("activity_date"),
      date_format(col("ts"), "HH:mm:ss").as("activity_time"),
      date_format(date_add(col("ts"), 7), "dd/MM/yyyy").as("next_activity_date"),
      when(col("event_type") === "click", "PHONE")
        .when(col("event_type") === "view", "FIELD")
        .when(col("event_type") === "purchase", "MESSAGING")
        .when(col("event_type") === "signup", "EMAIL")
        .when(col("event_id") % 2 === 0, "AGENT_BANK")
        .otherwise("CARRIER_PIGEON").as("collection_channel"),
      when(col("event_id") % 8 === 0, "PRIMARY")
        .when(col("event_id") % 8 === 1, "THIRD_PARTY")
        .when(col("event_id") % 8 === 2, "RELATIVE")
        .when(col("event_id") % 8 === 3, "NO_CONTACT")
        .when(col("event_id") % 8 === 4, "GUARANTOR")
        .when(col("event_id") % 8 === 5, "GUARANTOR_NO_CONTACT")
        .when(col("event_id") % 8 === 6, "UNKNOWN_TYPE")
        .otherwise("ESCALATION").as("contact_type"),
      when(col("event_id") % 5 === 0, "PAYMENT_PROMISE")
        .when(col("event_id") % 5 === 1, "RESTRUCTURE_REQUEST")
        .otherwise("NO_AGREEMENT").as("contact_outcome"),
      when(col("event_id") % 3 === 0, "UNEMPLOYMENT").otherwise("OTHER").as("non_payment_reason"),
      concat(lit("LOC_"), (col("event_id") % 4).cast("string")).as("contact_location"),
      when(col("event_id") % 2 === 0, "CALL_BACK").otherwise("VISIT").as("next_action"),
      when(col("event_id") % 13 === 0, lit(null).cast("string"))
        .otherwise(col("props")).as("notes"),
      when(col("event_id") % 11 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("+56"), (lit(900000000L) + col("event_id")).cast("string"))).as("phone_number"),
      concat(lit("DEPT_"), (col("event_id") % 3).cast("string")).as("department"),
      when(col("event_id") % 7 === 0, "AUTO_DIALER")
        .otherwise(concat(lit("AGENT_"), (col("event_id") % 7).cast("string"))).as("agent_name"),
      col("event_id").as("src_seq")) ++ extraCols.map(col): _*)
}
