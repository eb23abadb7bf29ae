package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training-data pipelines: emails, URLs, and long
  * digit runs (phone/account numbers) are counted and masked with
  * typed placeholder tokens. Pure map-side `regexp_replace`/
  * `regexp_count` Catalyst expressions — scan-speed at 100 TB, no
  * shuffle, codegen'd.
  *
  * Patterns deliberately use only syntax with identical semantics in
  * Java regex (Spark) and RE2 (DuckDB oracle): character classes,
  * bounded/unbounded repetition — no backrefs, no lookaround.
  * Replacement order (email → URL → digits) is part of the contract:
  * later patterns run over already-masked text, so a digit run inside
  * an email is masked once as part of the email, not twice.
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val LongNumRe = "[0-9]{7,}"

  private def redactOnce(c: Column, re: String, token: String): Column =
    regexp_replace(c, re, token)

  /** Adds `n_emails`/`n_urls`/`n_longnums` (counts over the ORIGINAL
    * text) and `redacted` (all three masked, in contract order).
    */
  def withRedactions(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", regexp_count(t, lit(EmailRe)))
      .withColumn("n_urls", regexp_count(t, lit(UrlRe)))
      .withColumn("n_longnums", regexp_count(t, lit(LongNumRe)))
      .withColumn("redacted",
        redactOnce(redactOnce(redactOnce(t, EmailRe, "<EMAIL>"),
          UrlRe, "<URL>"), LongNumRe, "<NUM>"))
  }
}
