"""Round-3 training-data additions: PII detect/redact, hashed linear
quality classifier, domain-blocklist URL filter.  Each oracle here is a
plain-python loop shadow (no Spark machinery shared with production)."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from localitysensitivesketch_spark.operators import pii as P
from localitysensitivesketch_spark.operators import textstats as T
from localitysensitivesketch_spark.operators.urls import (
    filter_blocked_hosts,
    host_suffixes,
    mark_blocked_hosts,
)

# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

PII_DOCS = [
    (0, "mail me at alice.smith+x@sub.Example.org or bob@ex.co today"),
    (1, "call 555-867-5309 or 415.555.0000 from host 10.0.0.1"),
    (2, "nothing sensitive here, just 1.2 numbers and a.b.c words"),
    (3, "edge: 999.999.999.999 still dotted-quad shaped; a@b.io"),
    (4, ""),
]


def _py_counts(text: str) -> tuple[int, int, int]:
    return (
        len(re.findall(P.EMAIL_PAT, text)),
        len(re.findall(P.PHONE_PAT, text)),
        len(re.findall(P.IPV4_PAT, text)),
    )


def test_pii_report_matches_python_shadow(spark):
    df = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in P.pii_report(df).collect()}
    for doc_id, text in PII_DOCS:
        e, p, i = _py_counts(text)
        r = got[doc_id]
        assert (r["n_emails"], r["n_phones"], r["n_ipv4"]) == (e, p, i), doc_id
        assert r["has_pii"] == (e + p + i > 0)


def test_pii_redact_matches_python_shadow_and_keeps_raw(spark):
    df = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in P.redact_pii(df).collect()}
    for doc_id, text in PII_DOCS:
        expect = re.sub(P.EMAIL_PAT, P.EMAIL_TOKEN, text)
        expect = re.sub(P.PHONE_PAT, P.PHONE_TOKEN, expect)
        expect = re.sub(P.IPV4_PAT, P.IPV4_TOKEN, expect)
        assert got[doc_id]["redacted_text"] == expect, doc_id
        assert got[doc_id]["text"] == text  # raw bytes untouched
    # email hosts are swallowed whole — no half-redacted '<IP>' inside them
    assert "<EMAIL>" in got[0]["redacted_text"]
    assert "@" not in got[0]["redacted_text"]


def test_pii_redact_order_email_before_ipv4(spark):
    # the address's host is a dotted quad: must become <EMAIL>, not u@<IP>
    df = spark.createDataFrame([(0, "u@1.2.3.4.io and bare 1.2.3.4")],
                               "doc_id long, text string")
    out = P.redact_pii(df).collect()[0]["redacted_text"]
    assert out == "<EMAIL> and bare <IP>"


# ---------------------------------------------------------------------------
# hashed linear quality classifier
# ---------------------------------------------------------------------------


def _u32(tok: str, seed: int = 42) -> int:
    return int(hashlib.md5(f"{tok}:{seed}".encode()).hexdigest()[:8], 16)


def test_hashed_linear_score_matches_integer_shadow(spark):
    docs = [(0, "the quick brown fox"), (1, "spark  spark "), (2, ""), (3, "Zebra")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in T.hashed_linear_score(df).collect()}
    for doc_id, text in docs:
        toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
        if not toks:
            assert got[doc_id]["score"] is None and got[doc_id]["keep"] is False
            continue
        total = sum(_u32(t) - 2**31 for t in toks)  # exact int arithmetic
        expect = round(total / (len(toks) * 2**31), 6)
        assert got[doc_id]["score"] == pytest.approx(expect, abs=1e-9)
        assert got[doc_id]["n_tokens"] == len(toks)
        assert got[doc_id]["keep"] == (expect > 0.0)


def test_hashed_linear_score_trained_weights_lookup(spark):
    w = [0.5, -1.0, 2.0, 0.25, -0.75, 1.5, -2.0, 0.0]
    docs = [(0, "alpha beta gamma delta"), (1, "alpha alpha")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in T.hashed_linear_score(df, weights=w).collect()}
    for doc_id, text in docs:
        toks = text.lower().split()
        expect = round(sum(w[_u32(t) % len(w)] for t in toks) / len(toks), 6)
        assert got[doc_id]["score"] == pytest.approx(expect, abs=1e-9)


def test_hashed_linear_score_partition_invariant(spark):
    rows = [(i, f"tok{i % 7} tok{i % 3} filler word{i}") for i in range(40)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string").repartition(1)
    df8 = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    a = {r["doc_id"]: r["score"] for r in T.hashed_linear_score(df1).collect()}
    b = {r["doc_id"]: r["score"] for r in T.hashed_linear_score(df8).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# domain blocklist
# ---------------------------------------------------------------------------

HOSTS = [
    (0, "ads.tracker.com"),
    (1, "tracker.com"),
    (2, "nottracker.com"),       # mid-label: must NOT match tracker.com
    (3, "deep.sub.tracker.com"),
    (4, "tracker.com.evil.net"), # suffix rule: does NOT match tracker.com
    (5, "localhost"),
    (6, "good.example.org"),
]
BLOCKED = ["tracker.com", "localhost"]
EXPECT_BLOCKED = {0, 1, 3, 5}


def test_host_suffixes_label_boundaries(spark):
    df = spark.createDataFrame([(0, "a.b.com"), (1, "x")], "i long, host string")
    got = {r["i"]: r["s"] for r in df.select("i", host_suffixes(F.col("host")).alias("s")).collect()}
    assert got[0] == ["b.com", "a.b.com"]
    assert got[1] == ["x"]


@pytest.mark.parametrize("as_df", [False, True])
def test_mark_blocked_hosts_both_paths(spark, as_df):
    df = spark.createDataFrame(HOSTS, "doc_id long, host string")
    blocked = (
        spark.createDataFrame([(b,) for b in BLOCKED], "blocked_host string")
        if as_df
        else BLOCKED
    )
    got = {r["doc_id"]: r["blocked"] for r in mark_blocked_hosts(df, blocked).collect()}
    assert {k for k, v in got.items() if v} == EXPECT_BLOCKED
    kept = {r["doc_id"] for r in filter_blocked_hosts(df, blocked).collect()}
    assert kept == {i for i, _ in HOSTS} - EXPECT_BLOCKED


def test_mark_blocked_hosts_df_path_is_broadcast(spark):
    df = spark.createDataFrame(HOSTS, "doc_id long, host string")
    blocked = spark.createDataFrame([(b,) for b in BLOCKED], "blocked_host string")
    plan = mark_blocked_hosts(df, blocked)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_blocklist_paths_agree_on_null_and_case(spark):
    """Review findings: the list path must not silently drop NULL-host
    rows (3-valued exists), and neither path may miss a match because the
    HOST side is not lowercased."""
    from pyspark.sql import functions as F

    from localitysensitivesketch_spark.operators.urls import (
        filter_blocked_hosts,
        mark_blocked_hosts,
    )

    df = spark.createDataFrame(
        [(1, "Spam.example.COM"), (2, "ok.org"), (3, None), (4, "sub.SPAM.example.com")],
        "doc_id long, host string",
    )
    bl_list = ["spam.example.com"]
    bl_df = spark.range(1).select(F.lit("spam.example.com").alias("blocked_host"))
    a = {r["doc_id"]: r["blocked"] for r in mark_blocked_hosts(df, bl_list).collect()}
    b = {r["doc_id"]: r["blocked"] for r in mark_blocked_hosts(df, bl_df).collect()}
    assert a == b == {1: True, 2: False, 3: False, 4: True}
    for bl in (bl_list, bl_df):
        kept = {r["doc_id"] for r in filter_blocked_hosts(df, bl).collect()}
        assert kept == {2, 3}  # NULL host survives in BOTH regimes


def test_pii_report_null_text_counts_zero(spark):
    """Review finding: NULL text must yield zero counts and has_pii
    False, not NULL (which silently drops rows in ~has_pii filters)."""
    from localitysensitivesketch_spark.operators.pii import pii_report

    df = spark.createDataFrame(
        [(1, "mail me at a@b.co"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_report(df).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["has_pii"] is True
    for d in (2, 3):
        assert out[d]["n_emails"] == 0 and out[d]["n_phones"] == 0
        assert out[d]["n_ipv4"] == 0 and out[d]["has_pii"] is False
    kept = pii_report(df).filter("not has_pii").count()
    assert kept == 2  # null-text row is NOT silently dropped


def test_surt_key_known_examples_and_prefix_property(spark):
    """SURT keys (Common Crawl CDX form): known transforms, default-port
    drop, kept non-default port, opaque passthrough — and the property
    that motivates the key: every url under a registrable domain shares
    the domain's SURT string prefix, so a sorted table answers
    subtree queries with a range scan."""
    from pyspark.sql import functions as F

    from localitysensitivesketch_spark.operators.urls import with_surt_key

    cases = [
        (0, "https://www.Example.com/a/b?b=2&a=1#f", "com,example,www)/a/b?a=1&b=2"),
        (1, "HTTP://Example.COM:80", "com,example)/"),
        (2, "http://example.com:8080/x", "com,example:8080)/x"),
        (3, "https://Example.com:443/", "com,example)/"),
        (4, "opaque-id-123", "opaque-id-123"),
        (5, "http://localhost/x", "localhost)/x"),
        (6, "http://a.b.example.com/deep/path", "com,example,b,a)/deep/path"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in cases], "doc_id long, url string"
    )
    got = {r["doc_id"]: r["surt_key"] for r in with_surt_key(df).collect()}
    for i, _, expect in cases:
        assert got[i] == expect, (i, got[i], expect)

    # prefix-range property over a family of subdomains
    fam = [(i, f"https://s{i}.w.example.com/p/{i}") for i in range(10)]
    fam.append((100, "https://other.org/q"))
    fdf = spark.createDataFrame(fam, "doc_id long, url string")
    keys = {r["doc_id"]: r["surt_key"] for r in with_surt_key(fdf).collect()}
    lo, hi = "com,example,", "com,example-"  # ',' < '-' < any label char
    in_range = {d for d, k in keys.items() if lo <= k < hi}
    assert in_range == {i for i in range(10)}
