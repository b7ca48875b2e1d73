package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus-curation column functions a training-data pipeline runs at ingest:
  * deterministic content-hash dataset splitting and PII scrubbing. Like
  * [[Text]], everything is built-in Catalyst expressions (codegen'd, no UDFs)
  * restricted to the Java-regex ∩ RE2 dialect so the DuckDB oracles mirror the
  * semantics 1:1.
  *
  * The reference pipeline has no splitting/PII surface (its corpus is a choir
  * spreadsheet); these are the engine-addition operators that make the text
  * stack usable for LLM corpus preparation, same family as [[Text]] / the
  * dedup kernels.
  */
object Curation {

  /** The first two hex chars of the content md5 — a uniform 256-bucket
    * content-addressed partition of any corpus. Hashing the CONTENT (not the
    * id) means byte-identical documents land in the same split no matter how
    * many times or under which ids they appear, so exact duplicates can never
    * straddle a train/eval boundary — the property dataset decontamination
    * starts from. md5 here is the cross-engine stability choice (same reason
    * as the q41 canonical-dedup key): DuckDB computes the identical hex. */
  def splitBucket(c: Column): Column =
    substring(md5(coalesce(c, lit("")).cast("binary")), 1, 2)

  /** Deterministic train/val/test assignment from [[splitBucket]], by
    * lexicographic cut points on the hex bucket (hex compares identically as
    * ASCII in any engine): bucket < `testLt` → test, < `valLt` → val, else
    * train. Defaults "0d"/"1a" give 13/256 ≈ 5.1% each to test and val.
    * Scan-local, shuffle-free, and reproducible run-over-run — the split is a
    * pure function of document content. */
  def splitAssign(c: Column, testLt: String = "0d", valLt: String = "1a"): Column = {
    require(testLt < valLt, s"test cut '$testLt' must precede val cut '$valLt'")
    // the two splitBucket occurrences are one md5 at runtime: codegen
    // subexpression elimination shares them within the projection
    when(splitBucket(c) < testLt, lit("test"))
      .when(splitBucket(c) < valLt, lit("val"))
      .otherwise(lit("train"))
  }

  /** Email pattern — local part, @, dotted domain, alphabetic TLD of ≥2.
    * Character classes and bounded quantifiers only: identical in Java regex
    * and RE2. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-format phone: '+' followed by 7–15 digits (E.164 bound). */
  val PhoneRe = "\\+[0-9]{7,15}"

  /** Dotted-quad IPv4 shape (syntactic — octet ranges not validated, which is
    * the standard scrubbing posture: over-redaction is safe, and range checks
    * cost a non-portable regex). \b is ASCII word boundary in both engines. */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def emailCount(c: Column): Column =
    regexp_count(coalesce(c, lit("")), lit(EmailRe)).cast("long")

  def phoneCount(c: Column): Column =
    regexp_count(coalesce(c, lit("")), lit(PhoneRe)).cast("long")

  def ipv4Count(c: Column): Column =
    regexp_count(coalesce(c, lit("")), lit(Ipv4Re)).cast("long")

  /** Replace every PII match with a typed placeholder. Replacement order is
    * part of the contract (mirrored by the oracle): emails first (their
    * domains may contain IP-shaped dotted quads), then IPv4, then phones —
    * each pass runs on the output of the previous one. Idempotent: no
    * placeholder is itself matched by a later pattern. */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(coalesce(c, lit("")), EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
}
