package graft

/** DuckDB-dialect SQL mirror of [[Derive]] and of the reference pipeline
  * (`/root/reference/01_staging_layer.sql`, `02_reporting_layer.sql`),
  * used as the driver's oracle (BASELINE.md t2 gate).
  *
  * Dialect mapping notes (SURVEY.md §7.4):
  *  - SQLite `DATE(expr)` → DuckDB `TRY_CAST(expr AS DATE)` (NULL on bad
  *    input, matching Spark non-ANSI `to_date`).
  *  - SQLite `STRFTIME('%fmt', d)` → DuckDB `strftime(d, '%fmt')`.
  *  - Every window ORDER BY pins null ordering (`ASC NULLS FIRST` /
  *    `DESC NULLS LAST` = Spark defaults) and appends a deterministic
  *    tie-breaker (`src_seq` / `operation_number`).
  */
object DeriveSql {

  /** CTE body mirroring [[Derive.stgAccounts]]. */
  val stgAccounts: String =
    """stg_accounts AS (
      |  SELECT
      |    'ACME_COLLECTIONS' AS collection_company,
      |    CAST(o_custkey AS VARCHAR) AS account_id,
      |    CAST(o_orderkey % 10 AS VARCHAR) AS account_checkdigit,
      |    CASE WHEN o_orderkey % 3 = 0 THEN 'INTERNAL' ELSE 'EXTERNAL' END AS agent_type,
      |    'CUST_' || CAST(o_custkey AS VARCHAR) AS customer_name,
      |    CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'MORTGAGE'
      |         WHEN o_orderpriority = '3-MEDIUM' THEN 'COMMERCIAL_LOAN'
      |         ELSE 'CONSUMER_LOAN' END AS product_type,
      |    'SEG_' || CAST(o_orderkey % 5 AS VARCHAR) AS risk_segment,
      |    o_totalprice AS outstanding_balance,
      |    'AGENT_' || CAST(o_orderkey % 7 AS VARCHAR) AS agent_name,
      |    CAST(o_orderkey AS VARCHAR) AS operation_number,
      |    CAST(CASE WHEN o_orderkey % 4 = 0 THEN 25.5 ELSE 0.0 END AS DOUBLE) AS containment_percentage,
      |    CASE WHEN o_orderstatus = 'F' THEN 'COMMERCIAL' ELSE 'RETAIL' END AS business_division,
      |    'METRO_AREA_' || CAST(o_custkey % 5 AS VARCHAR) AS customer_city
      |  FROM orders
      |)""".stripMargin

  /** CTE body mirroring [[Derive.stgActivities]]. */
  val stgActivities: String =
    """stg_activities AS (
      |  SELECT
      |    CAST(user_id AS VARCHAR) AS account_id,
      |    CASE WHEN event_id % 19 = 0 THEN '99/99/9999'
      |         ELSE strftime(ts, '%d/%m/%Y') END AS activity_date,
      |    strftime(ts, '%H:%M:%S') AS activity_time,
      |    strftime(CAST(ts AS DATE) + 7, '%d/%m/%Y') AS next_activity_date,
      |    CASE WHEN event_type = 'click' THEN 'PHONE'
      |         WHEN event_type = 'view' THEN 'FIELD'
      |         WHEN event_type = 'purchase' THEN 'MESSAGING'
      |         WHEN event_type = 'signup' THEN 'EMAIL'
      |         WHEN event_id % 2 = 0 THEN 'AGENT_BANK'
      |         ELSE 'CARRIER_PIGEON' END AS collection_channel,
      |    CASE WHEN event_id % 8 = 0 THEN 'PRIMARY'
      |         WHEN event_id % 8 = 1 THEN 'THIRD_PARTY'
      |         WHEN event_id % 8 = 2 THEN 'RELATIVE'
      |         WHEN event_id % 8 = 3 THEN 'NO_CONTACT'
      |         WHEN event_id % 8 = 4 THEN 'GUARANTOR'
      |         WHEN event_id % 8 = 5 THEN 'GUARANTOR_NO_CONTACT'
      |         WHEN event_id % 8 = 6 THEN 'UNKNOWN_TYPE'
      |         ELSE 'ESCALATION' END AS contact_type,
      |    CASE WHEN event_id % 5 = 0 THEN 'PAYMENT_PROMISE'
      |         WHEN event_id % 5 = 1 THEN 'RESTRUCTURE_REQUEST'
      |         ELSE 'NO_AGREEMENT' END AS contact_outcome,
      |    CASE WHEN event_id % 3 = 0 THEN 'UNEMPLOYMENT' ELSE 'OTHER' END AS non_payment_reason,
      |    'LOC_' || CAST(event_id % 4 AS VARCHAR) AS contact_location,
      |    CASE WHEN event_id % 2 = 0 THEN 'CALL_BACK' ELSE 'VISIT' END AS next_action,
      |    CASE WHEN event_id % 13 = 0 THEN NULL ELSE props END AS notes,
      |    CASE WHEN event_id % 11 = 0 THEN NULL
      |         ELSE '+56' || CAST(900000000 + event_id AS VARCHAR) END AS phone_number,
      |    'DEPT_' || CAST(event_id % 3 AS VARCHAR) AS department,
      |    CASE WHEN event_id % 7 = 0 THEN 'AUTO_DIALER'
      |         ELSE 'AGENT_' || CAST(event_id % 7 AS VARCHAR) END AS agent_name,
      |    event_id AS src_seq
      |  FROM events
      |)""".stripMargin

  /** SQLite `DATE(SUBSTR(c,7,4)||'-'||SUBSTR(c,4,2)||'-'||SUBSTR(c,1,2))`
    * (reference `01_staging_layer.sql:64-68`) in DuckDB.
    */
  private def parseDdMmYyyy(c: String): String =
    s"TRY_CAST(substr($c,7,4) || '-' || substr($c,4,2) || '-' || substr($c,1,2) AS DATE)"

  private val channelCase: String =
    """CASE WHEN collection_channel = 'PHONE' THEN '01.PHONE'
      |     WHEN collection_channel = 'FIELD' THEN '02.FIELD'
      |     WHEN collection_channel = 'MESSAGING' THEN '03.MESSAGING'
      |     WHEN collection_channel = 'EMAIL' THEN '04.EMAIL'
      |     WHEN collection_channel = 'AGENT_BANK' THEN '05.AGENT_BANK'
      |     ELSE 'UNCLASSIFIED_CHANNEL' END""".stripMargin

  /** Reference `01_staging_layer.sql:85-97` (full variant). */
  private val contactTypeCaseFull: String =
    """CASE WHEN contact_type = 'PRIMARY' THEN '01.PRIMARY'
      |     WHEN contact_type IN ('THIRD_PARTY','RELATIVE') THEN '02.THIRD_PARTY'
      |     WHEN contact_type = 'NO_CONTACT' AND agent_name = 'AUTO_DIALER' THEN '04.AUTO_DIALER'
      |     WHEN contact_type = 'NO_CONTACT' THEN '03.NO_CONTACT'
      |     WHEN contact_type IN ('GUARANTOR','GUARANTOR_NO_CONTACT') THEN 'GUARANTOR'
      |     WHEN collection_channel = 'FIELD' THEN 'FIELD'
      |     WHEN collection_channel = 'MESSAGING' AND contact_type = 'PRIMARY' THEN '01.PRIMARY'
      |     WHEN collection_channel = 'MESSAGING' AND contact_type IN ('THIRD_PARTY','RELATIVE') THEN '02.THIRD_PARTY'
      |     WHEN collection_channel = 'MESSAGING' AND contact_type = 'NO_CONTACT' THEN '03.NO_CONTACT'
      |     WHEN collection_channel IN ('EMAIL','AGENT_BANK') THEN 'EMAIL'
      |     ELSE 'UNCLASSIFIED_CONTACT' END""".stripMargin

  /** Reference `01_staging_layer.sql:173-180` (field-view variant). */
  private val contactTypeCaseField: String =
    """CASE WHEN contact_type = 'PRIMARY' THEN '01.PRIMARY'
      |     WHEN contact_type IN ('THIRD_PARTY','RELATIVE') THEN '02.THIRD_PARTY'
      |     WHEN contact_type = 'NO_CONTACT' AND agent_name = 'AUTO_DIALER' THEN '04.AUTO_DIALER'
      |     WHEN contact_type = 'NO_CONTACT' THEN '03.NO_CONTACT'
      |     WHEN contact_type IN ('GUARANTOR','GUARANTOR_NO_CONTACT') THEN 'GUARANTOR'
      |     ELSE 'UNCLASSIFIED_CONTACT' END""".stripMargin

  private val passThrough =
    "contact_outcome, non_payment_reason, contact_location, next_action, notes, phone_number, department, agent_name"

  val viewCols: String =
    "account_id, activity_date, activity_time, next_activity_date, collection_channel, contact_type, " + passThrough

  /** One contact view as a pair of CTEs (preprocessing + ranked), ending in
    * the `row_num = 1` select. Mirrors the reference's CTE structure with a
    * `src_seq` tie-breaker appended to the window order.
    */
  private def contactViewCtes(name: String, filter: String, channelExpr: String,
      contactTypeExpr: String, orderBy: String): String =
    s"""${name}_pre AS (
       |  SELECT
       |    account_id,
       |    ${parseDdMmYyyy("activity_date")} AS activity_date,
       |    activity_time,
       |    ${parseDdMmYyyy("next_activity_date")} AS next_activity_date,
       |    $channelExpr AS collection_channel,
       |    $contactTypeExpr AS contact_type,
       |    $passThrough,
       |    src_seq
       |  FROM stg_activities
       |  $filter
       |),
       |$name AS (
       |  SELECT $viewCols
       |  FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY account_id
       |      ORDER BY $orderBy, src_seq ASC NULLS FIRST) AS row_num
       |    FROM ${name}_pre
       |  ) WHERE row_num = 1
       |)""".stripMargin

  val cleanAccounts: String =
    """clean_accounts AS (
      |  SELECT *,
      |    CASE WHEN customer_city IN ('METRO_AREA_1','METRO_AREA_2','METRO_AREA_3')
      |         THEN 'YES' ELSE 'NO' END AS coverage_area
      |  FROM stg_accounts
      |)""".stripMargin

  val cleanContactsPrimary: String = contactViewCtes(
    "clean_contacts_primary", "", channelCase, contactTypeCaseFull,
    "collection_channel ASC NULLS FIRST, contact_type ASC NULLS FIRST, activity_date DESC NULLS LAST")

  val cleanContactsField: String = contactViewCtes(
    "clean_contacts_field", "WHERE collection_channel = 'FIELD'",
    "'02.FIELD'", contactTypeCaseField,
    "contact_type ASC NULLS FIRST, activity_date DESC NULLS LAST")

  val cleanContactsPromise: String = contactViewCtes(
    "clean_contacts_promise", "WHERE contact_outcome = 'PAYMENT_PROMISE'",
    channelCase, "'PROMISE'",
    "activity_date DESC NULLS LAST, activity_time DESC NULLS LAST")

  val cleanContactsRestructure: String = contactViewCtes(
    "clean_contacts_restructure", "WHERE contact_outcome = 'RESTRUCTURE_REQUEST'",
    channelCase, "'RESTRUCTURE'",
    "activity_date DESC NULLS LAST, activity_time DESC NULLS LAST")

  /** Full staging prelude: both derivations + all 5 views. */
  val stagingPrelude: String = Seq(
    stgAccounts, stgActivities, cleanAccounts, cleanContactsPrimary,
    cleanContactsField, cleanContactsPromise, cleanContactsRestructure
  ).mkString("WITH ", ",\n", "")

  /** Wrap a final SELECT with the staging prelude. */
  def withStaging(finalSelect: String): String = s"$stagingPrelude\n$finalSelect"

  /** Shared contact projection of the reports
    * (reference `02_reporting_layer.sql:48-64`).
    */
  private val reportContactProjection: String =
    """COALESCE(c.phone_number, 'NO_CONTACT') AS contact_phone,
      |    COALESCE(c.notes, 'NO_CONTACT') AS activity_notes,
      |    COALESCE(
      |      CASE WHEN c.contact_type = '01.PRIMARY' THEN 'PRIMARY'
      |           WHEN c.contact_type = '02.THIRD_PARTY' THEN 'THIRD_PARTY'
      |           WHEN c.contact_type = '03.NO_CONTACT' THEN 'NO_CONTACT'
      |           WHEN c.contact_type = '04.AUTO_DIALER' THEN 'AUTO_DIALER'
      |           ELSE 'NO_CONTACT' END,
      |      'NO_CONTACT') AS contact_type,
      |    COALESCE(strftime(c.activity_date, '%Y-%m-%d'), 'NO_CONTACT') AS last_activity_date""".stripMargin

  private val portfolioOutputCols: String =
    """account_id, account_checkdigit, agent_type, customer_name, product_type,
      |  risk_segment, outstanding_balance, agent_name, operation_number,
      |  contact_phone, activity_notes, contact_type, last_activity_date,
      |  field_visit_completed, business_division, customer_city, coverage_area""".stripMargin

  /** Report 1 (reference `02_reporting_layer.sql:37-120`) with the
    * `operation_number` tie-breaker in the dedup window.
    */
  val report1: String = withStaging(
    s""", filtered_accounts AS (
       |  SELECT
       |    a.account_id, a.account_checkdigit, a.agent_type, a.customer_name,
       |    a.product_type, a.risk_segment, a.outstanding_balance, a.agent_name,
       |    a.operation_number,
       |    $reportContactProjection,
       |    CASE WHEN f.account_id IS NOT NULL THEN 'YES' ELSE 'NO' END AS field_visit_completed,
       |    a.business_division, a.customer_city, a.coverage_area
       |  FROM clean_accounts a
       |  LEFT JOIN clean_contacts_primary c ON a.account_id = c.account_id
       |  LEFT JOIN clean_contacts_field f ON a.account_id = f.account_id
       |  WHERE a.product_type = 'MORTGAGE'
       |    AND a.business_division = 'RETAIL'
       |    AND a.containment_percentage = 0
       |),
       |deduplicated_accounts AS (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY account_id
       |    ORDER BY risk_segment DESC NULLS LAST, operation_number ASC NULLS FIRST) AS row_num
       |  FROM filtered_accounts
       |)
       |SELECT 'COMPANY_NAME' AS company,
       |  $portfolioOutputCols
       |FROM deduplicated_accounts WHERE row_num = 1""".stripMargin)

  /** Report 2 (reference `02_reporting_layer.sql:130-214`); keeps the
    * reference's LEFT JOIN + null-rejecting WHERE formulation.
    */
  val report2: String = withStaging(
    s""", filtered_accounts AS (
       |  SELECT
       |    a.account_id, a.account_checkdigit, a.agent_type, a.customer_name,
       |    a.product_type, a.risk_segment, a.outstanding_balance, a.agent_name,
       |    a.operation_number,
       |    $reportContactProjection,
       |    CASE WHEN f.account_id IS NOT NULL THEN 'YES' ELSE 'NO' END AS field_visit_completed,
       |    a.business_division, a.customer_city, a.coverage_area
       |  FROM clean_accounts a
       |  LEFT JOIN clean_contacts_primary c ON a.account_id = c.account_id
       |  LEFT JOIN clean_contacts_field f ON a.account_id = f.account_id
       |  LEFT JOIN clean_contacts_restructure r ON a.account_id = r.account_id
       |  WHERE a.business_division = 'RETAIL'
       |    AND a.containment_percentage = 0
       |    AND r.contact_type = 'RESTRUCTURE'
       |),
       |deduplicated_accounts AS (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY account_id
       |    ORDER BY product_type ASC NULLS FIRST, risk_segment DESC NULLS LAST,
       |             operation_number ASC NULLS FIRST) AS row_num
       |  FROM filtered_accounts
       |)
       |SELECT 'COMPANY_NAME' AS company,
       |  $portfolioOutputCols
       |FROM deduplicated_accounts WHERE row_num = 1""".stripMargin)

  /** Report 3 (reference `02_reporting_layer.sql:224-292`). */
  val report3: String = withStaging(
    """, filtered_accounts AS (
      |  SELECT
      |    a.account_id, a.account_checkdigit, a.customer_name, a.agent_type,
      |    a.risk_segment, a.outstanding_balance, a.operation_number,
      |    COALESCE(c.collection_channel, 'NO_CONTACT') AS collection_channel,
      |    COALESCE(
      |      CASE WHEN c.contact_type = '01.PRIMARY' THEN 'PRIMARY'
      |           WHEN c.contact_type = '02.THIRD_PARTY' THEN 'THIRD_PARTY'
      |           WHEN c.contact_type = '03.NO_CONTACT' THEN 'NO_CONTACT'
      |           WHEN c.contact_type = '04.AUTO_DIALER' THEN 'AUTO_DIALER'
      |           ELSE 'NO_CONTACT' END,
      |      'NO_CONTACT') AS contact_type,
      |    CASE WHEN p.account_id IS NOT NULL THEN 'YES' ELSE 'NO' END AS payment_promise_active,
      |    COALESCE(strftime(p.next_activity_date, '%Y-%m-%d'), 'NO_PROMISE_DATE') AS promise_date,
      |    COALESCE(c.phone_number, 'NO_CONTACT') AS contact_phone,
      |    COALESCE(c.notes, 'NO_CONTACT') AS activity_notes
      |  FROM clean_accounts a
      |  LEFT JOIN clean_contacts_primary c ON a.account_id = c.account_id
      |  LEFT JOIN clean_contacts_promise p ON a.account_id = p.account_id
      |  WHERE a.business_division = 'RETAIL'
      |    AND a.containment_percentage = 0
      |    AND a.product_type = 'COMMERCIAL_LOAN'
      |),
      |deduplicated_accounts AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY account_id
      |    ORDER BY risk_segment DESC NULLS LAST, operation_number ASC NULLS FIRST) AS row_num
      |  FROM filtered_accounts
      |)
      |SELECT 'COMPANY_NAME' AS company,
      |  account_id, account_checkdigit, customer_name, agent_type, risk_segment,
      |  outstanding_balance, collection_channel, contact_type,
      |  payment_promise_active, promise_date, contact_phone, activity_notes
      |FROM deduplicated_accounts WHERE row_num = 1""".stripMargin)
}
