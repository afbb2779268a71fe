"""PII detection and redaction — a curation-tier filter for web corpora.

Training-data pipelines scrub personally identifiable information from
crawled text before anything downstream sees it (the BigScience ROOTS /
C4 lineage of regex scrubbers).  The reference engine has no PII stage —
this is one of the training-data additions grafted onto its curation
funnel (SURVEY §2.9) — but it follows the same execution contract as
every other text operator here:

* **pure built-in regex column functions** (`regexp_extract_all`,
  `regexp_replace`) — JVM-side, inside whole-stage codegen, zero Python
  in the hot path;
* patterns restricted to the RE2 ∩ java.util.regex common dialect so the
  identical expressions run in the DuckDB oracle;
* the raw ``text`` column is never rewritten (input_hint invariant) —
  :func:`redact_pii` adds a derived column, like ``functions/text.py``.

Three detector classes cover the high-volume scrubber targets:

=========  =====================================================
kind       pattern (deliberately conservative / engine-portable)
=========  =====================================================
email      ``[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}``
phone      NANP-style ``\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b``
ipv4       ``\\b(\\d{1,3}\\.){3}\\d{1,3}\\b`` (dotted quad)
=========  =====================================================

Redaction order matters (an email's host part must not be half-eaten by
the ipv4 rule): emails are replaced first, then phones, then IPs, each
with a typed placeholder token so downstream token statistics stay
meaningful.

At 10^12 documents this is a map-only pass — no shuffle, no state; it
composes with :class:`~..plans.curation.CurationPipeline` as a projection
tier and the report aggregates with one hash aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2 ∩ Java common dialect only: no lookarounds, no backreferences, no
# possessive quantifiers.  \b, \d and non-capturing groups are in both.
EMAIL_PAT = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_PAT = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"
IPV4_PAT = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IPV4_TOKEN = "<IP>"


def _n_matches(col: Column, pat: str) -> Column:
    # size(regexp_extract_all(...)) rather than regexp_count: the DuckDB
    # oracle expresses the identical plan as len(regexp_extract_all(...)).
    # coalesce: NULL text means zero matches (not a NULL count that would
    # make has_pii three-valued and silently drop rows in ~has_pii
    # filters); the oracle coalesces identically.
    return F.coalesce(
        F.size(F.regexp_extract_all(col, F.lit(pat), 0)), F.lit(0)
    ).cast("long")


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-row match counts for each detector class (independent counts —
    an email also containing a dotted quad in its host counts for both,
    exactly as the oracle's per-pattern scan does)."""
    return {
        "n_emails": _n_matches(text, EMAIL_PAT),
        "n_phones": _n_matches(text, PHONE_PAT),
        "n_ipv4": _n_matches(text, IPV4_PAT),
    }


def pii_report(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII detection report: ``(id, n_emails, n_phones,
    n_ipv4, has_pii)``.  Map-only; wide payload columns are pruned at the
    scan (only ``id_col`` and ``text_col`` are read)."""
    counts = pii_counts(F.col(text_col))
    out = df.select(F.col(id_col), *[v.alias(k) for k, v in counts.items()])
    return out.withColumn(
        "has_pii",
        (F.col("n_emails") + F.col("n_phones") + F.col("n_ipv4")) > 0,
    )


def redact_text(text: Column) -> Column:
    """Typed-placeholder redaction, email → phone → ipv4 in that order
    (emails first so the ipv4 rule never bites a host's dotted quad
    before the whole address is gone)."""
    out = F.regexp_replace(text, EMAIL_PAT, EMAIL_TOKEN)
    out = F.regexp_replace(out, PHONE_PAT, PHONE_TOKEN)
    return F.regexp_replace(out, IPV4_PAT, IPV4_TOKEN)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted_text"
) -> DataFrame:
    """Adds ``out_col`` with PII replaced by typed placeholders; the raw
    ``text_col`` is kept untouched (input_hint invariant — byte-identical
    extracted text per url is preserved, scrubbing is a derived view)."""
    return df.withColumn(out_col, redact_text(F.col(text_col)))
