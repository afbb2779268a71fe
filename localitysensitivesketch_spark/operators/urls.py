"""URL canonicalization — the recrawl tier's key projection.

Common-Crawl-style corpora carry the same page under cosmetically
different urls (scheme/host case, default ports, fragments, query-param
order, trailing slashes).  :func:`normalize_urls` derives a canonical
form so :func:`~..operators.dedup.latest_capture` and url-keyed joins
collapse those variants; the raw ``url`` column is never rewritten (the
same derived-projection rule as ``functions/text.py`` — input_hint
invariant).

All steps are built-in regex/array column functions (JVM-side, inside
whole-stage codegen, no Python), chosen so the identical pipeline runs
in a DuckDB/RE2 oracle:

1. strip the fragment (``#...``)
2. lowercase scheme+host (path/query case is preserved — it is
   significant on most servers)
3. drop default ports (``http://…:80``, ``https://…:443``)
4. strip trailing slashes from the path
5. sort query parameters (``?b=2&a=1`` → ``?a=1&b=2``); a bare ``?`` is
   dropped

A url with no ``scheme://host`` prefix is passed through unchanged
(opaque ids stay stable rather than half-normalized).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPLIT_PAT = r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)(.*)$"


def canonical_url(url: Column) -> Column:
    u = F.regexp_replace(url, "#.*", "")
    sh = F.lower(F.regexp_extract(u, _SPLIT_PAT, 1))
    sh = F.regexp_replace(sh, "^(http://.*):80$", "$1")
    sh = F.regexp_replace(sh, "^(https://.*):443$", "$1")
    rest = F.regexp_extract(u, _SPLIT_PAT, 2)
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), "/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    canon = F.concat(
        sh,
        path,
        F.when(
            query != F.lit(""),
            F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(query, "&")), "&")),
        ).otherwise(F.lit("")),
    )
    return F.when(sh == F.lit(""), url).otherwise(canon)


def url_host(url: Column) -> Column:
    """Registrable host of a (canonical or raw) url, '' when opaque —
    the blocking/stats key for per-domain aggregation."""
    return F.lower(F.regexp_extract(url, r"://([^/:?#]*)", 1))


def normalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """Adds ``canonical_url`` and ``host`` derived columns (raw url kept)."""
    return df.withColumn(out_col, canonical_url(F.col(url_col))).withColumn(
        "host", url_host(F.col(out_col))
    )


def surt_key(url: Column) -> Column:
    """Sort-friendly URI Reordering Transform key (the Common Crawl CDX
    index form): host labels reversed and comma-joined, optional
    non-default port kept, then ``)`` and the canonical path+query —
    ``https://www.Example.com/a/b?b=2&a=1`` →
    ``com,example,www)/a/b?a=1&b=2``.

    Why a 100 TB webtext engine wants it: SURT keys make the host
    hierarchy a string PREFIX hierarchy, so a table sorted/range-
    partitioned by ``surt_key`` answers "everything under
    ``*.example.com``" with partition pruning + a range scan
    (apex + subtree: ``surt_key >= 'com,example' AND surt_key <
    'com,example-'`` — ``-`` is the first codepoint after ``,``, so the
    upper bound admits both the apex's ``com,example)/…`` keys and every
    subdomain's ``com,example,…`` keys; subdomains ONLY would be the
    comma-bounded pair ``>= 'com,example,' AND < 'com,example-'``),
    where raw urls scatter subdomains across the keyspace.  Derived from
    :func:`canonical_url` (lowered host, dropped default port/fragment,
    sorted query), all inside whole-stage codegen; urls with no
    ``scheme://host`` pass through unchanged, exactly like
    :func:`canonical_url`.

    Design choices, documented: ``www`` and other subdomain labels are
    KEPT (classic SURT variants differ here) — dropping them belongs to
    a blocklist/aggregation policy, not an index key; and IPv4-literal
    hosts are reversed by octet like any labels (``10.0.0.1`` →
    ``1,0,0,10``) rather than special-cased — the key only needs to be
    deterministic and self-consistent to sort, and octet reversal keeps
    one uniform rule.
    """
    c = canonical_url(url)
    hostport = F.regexp_extract(c, r"://([^/?#]*)", 1)
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    rest = F.regexp_extract(c, _SPLIT_PAT, 2)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    key = F.concat(
        rev,
        F.when(port != F.lit(""), F.concat(F.lit(":"), port)).otherwise(
            F.lit("")
        ),
        F.lit(")"),
        F.when(path != F.lit(""), path).otherwise(F.lit("/")),
        F.when(query != F.lit(""), F.concat(F.lit("?"), query)).otherwise(
            F.lit("")
        ),
    )
    return F.when(host == F.lit(""), url).otherwise(key)


def with_surt_key(
    df: DataFrame, url_col: str = "url", out_col: str = "surt_key"
) -> DataFrame:
    """Adds the ``surt_key`` derived column (raw url kept)."""
    return df.withColumn(out_col, surt_key(F.col(url_col)))


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host with ≥2 labels, shortest→longest
    (``a.b.com`` → ``[b.com, a.b.com]``).  Label-boundary suffixes are the
    blocklist matching unit: blocking a registrable domain blocks every
    subdomain, but never a bare TLD and never a mid-label substring.  A
    single-label host (``localhost``) yields just itself."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(2), n),
            lambda k: F.array_join(F.slice(labels, n - k + 1, k), "."),
        ),
    ).otherwise(F.array(host))


def mark_blocked_hosts(
    df: DataFrame,
    blocked: DataFrame | list[str],
    host_col: str = "host",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-blocklist tagging (the URL-level hygiene tier every web
    corpus runs before text ever loads — C4's badwords/domain lists):
    adds boolean ``blocked`` = some label-boundary suffix of ``host_col``
    appears in the blocklist.

    Two scale regimes, same semantics:

    * ``blocked`` as a python list (small curated list) — an
      ``array_contains`` over the suffix array entirely inside
      whole-stage codegen: zero joins, zero shuffles, map-only;
    * ``blocked`` as a DataFrame with column ``blocked_host`` (millions
      of domains) — explode the ≤#labels suffixes of each row (narrow
      ``(id, suffix)`` rows; the wide payload never moves) and broadcast
      hash-join against the blocklist, then a left join back on id.  At
      10^12 docs both sides of that join stay narrow.
    """
    # lowercase the HOST side too: blocklist entries are lowered, and
    # nothing guarantees host_col came from normalize_urls — without this
    # a raw 'Example.COM' silently never matches
    sufs = host_suffixes(F.lower(F.col(host_col)))
    if isinstance(blocked, list):
        arr = F.array(*[F.lit(b.lower()) for b in blocked])
        # coalesce: a NULL host yields exists(...)=NULL; both scale paths
        # must agree that an unresolvable host is NOT blocked
        return df.withColumn(
            "blocked",
            F.coalesce(
                F.exists(sufs, lambda s: F.array_contains(arr, s)),
                F.lit(False),
            ),
        )
    hits = (
        df.select(F.col(id_col), F.explode(sufs).alias("suffix"))
        .join(
            F.broadcast(
                blocked.select(F.lower(F.col("blocked_host")).alias("suffix"))
            ),
            "suffix",
        )
        .select(id_col)
        .distinct()
        .withColumn("blocked", F.lit(True))
    )
    return df.join(hits, id_col, "left").withColumn(
        "blocked", F.coalesce(F.col("blocked"), F.lit(False))
    )


def filter_blocked_hosts(
    df: DataFrame,
    blocked: DataFrame | list[str],
    host_col: str = "host",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep only rows whose host matches no blocklist entry (see
    :func:`mark_blocked_hosts` for the matching rule and scale paths)."""
    return (
        mark_blocked_hosts(df, blocked, host_col=host_col, id_col=id_col)
        .filter(~F.col("blocked"))
        .drop("blocked")
    )
