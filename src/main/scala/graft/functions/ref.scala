package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level expression library for the reference's scalar surface
  * (SURVEY.md §2.2). Every function is a pure `Column => Column` built from
  * `org.apache.spark.sql.functions._` — fully codegen'd, no UDFs — so each
  * stays inside WholeStageCodegen at any scale.
  *
  * Sources: /root/reference/01_staging_layer.sql, 02_reporting_layer.sql.
  */
object ref {

  /** DD/MM/YYYY string → DateType, NULL on malformed input.
    *
    * Mirrors `01_staging_layer.sql:64-68`: `DATE(SUBSTR(d,7,4)||'-'||
    * SUBSTR(d,4,2)||'-'||SUBSTR(d,1,2))` with SQLite's NULL-on-garbage
    * semantics. `try_to_timestamp` keeps the NULL behavior even if the
    * session runs ANSI mode (SURVEY.md §7.4 item 3).
    */
  def parseDdMmYyyy(c: Column): Column =
    try_to_timestamp(
      concat(substring(c, 7, 4), lit("-"), substring(c, 4, 2), lit("-"), substring(c, 1, 2)),
      lit("yyyy-MM-dd")
    ).cast("date")

  /** DateType → 'YYYY-MM-DD' string (NULL-preserving).
    * Mirrors `STRFTIME('%Y-%m-%d', d)` at `02_reporting_layer.sql:60,153,247`.
    */
  def formatIsoDate(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Channel classification with sortable priority prefix.
    * Mirrors `01_staging_layer.sql:76-83` — the `01.`/`02.` prefix encodes
    * business priority as binary-collation lexicographic order (SURVEY.md
    * §7.4 item 4).
    */
  def channelPriority(channel: Column): Column =
    when(channel === "PHONE", "01.PHONE")
      .when(channel === "FIELD", "02.FIELD")
      .when(channel === "MESSAGING", "03.MESSAGING")
      .when(channel === "EMAIL", "04.EMAIL")
      .when(channel === "AGENT_BANK", "05.AGENT_BANK")
      .otherwise("UNCLASSIFIED_CHANNEL")

  /** Contact-type standardization, full variant used by the primary-contact
    * view. Mirrors `01_staging_layer.sql:85-97` branch-for-branch (including
    * the unreachable MESSAGING branches — kept for semantic fidelity).
    */
  def normalizeContactType(contactType: Column, channel: Column, agentName: Column): Column =
    when(contactType === "PRIMARY", "01.PRIMARY")
      .when(contactType.isin("THIRD_PARTY", "RELATIVE"), "02.THIRD_PARTY")
      .when(contactType === "NO_CONTACT" && agentName === "AUTO_DIALER", "04.AUTO_DIALER")
      .when(contactType === "NO_CONTACT", "03.NO_CONTACT")
      .when(contactType.isin("GUARANTOR", "GUARANTOR_NO_CONTACT"), "GUARANTOR")
      .when(channel === "FIELD", "FIELD")
      .when(channel === "MESSAGING" && contactType === "PRIMARY", "01.PRIMARY")
      .when(channel === "MESSAGING" && contactType.isin("THIRD_PARTY", "RELATIVE"), "02.THIRD_PARTY")
      .when(channel === "MESSAGING" && contactType === "NO_CONTACT", "03.NO_CONTACT")
      .when(channel.isin("EMAIL", "AGENT_BANK"), "EMAIL")
      .otherwise("UNCLASSIFIED_CONTACT")

  /** Short contact-type variant used by the field-visit view.
    * Mirrors `01_staging_layer.sql:173-180`.
    */
  def normalizeContactTypeField(contactType: Column, agentName: Column): Column =
    when(contactType === "PRIMARY", "01.PRIMARY")
      .when(contactType.isin("THIRD_PARTY", "RELATIVE"), "02.THIRD_PARTY")
      .when(contactType === "NO_CONTACT" && agentName === "AUTO_DIALER", "04.AUTO_DIALER")
      .when(contactType === "NO_CONTACT", "03.NO_CONTACT")
      .when(contactType.isin("GUARANTOR", "GUARANTOR_NO_CONTACT"), "GUARANTOR")
      .otherwise("UNCLASSIFIED_CONTACT")

  /** Strip the priority prefix back off for report output; unknown/NULL →
    * 'NO_CONTACT'. Mirrors `02_reporting_layer.sql:51-57` (CASE wrapped in
    * COALESCE — the ELSE already yields the sentinel, kept for fidelity).
    */
  def stripPriorityPrefix(c: Column): Column =
    coalesce(
      when(c === "01.PRIMARY", "PRIMARY")
        .when(c === "02.THIRD_PARTY", "THIRD_PARTY")
        .when(c === "03.NO_CONTACT", "NO_CONTACT")
        .when(c === "04.AUTO_DIALER", "AUTO_DIALER")
        .otherwise("NO_CONTACT"),
      lit("NO_CONTACT"))

  /** Metro-coverage flag. Mirrors `01_staging_layer.sql:40-43`. */
  def coverageArea(city: Column): Column =
    when(city.isin("METRO_AREA_1", "METRO_AREA_2", "METRO_AREA_3"), "YES").otherwise("NO")

  /** NULL → sentinel after an outer join. Mirrors the COALESCE pattern at
    * `02_reporting_layer.sql:48-60`.
    */
  def sentinel(c: Column, s: String = "NO_CONTACT"): Column = coalesce(c, lit(s))

  /** Existence flag from a LEFT-JOINed key column ('YES' iff matched).
    * Mirrors `02_reporting_layer.sql:61-64`.
    */
  def existenceFlag(c: Column): Column =
    when(c.isNotNull, "YES").otherwise("NO")
}
