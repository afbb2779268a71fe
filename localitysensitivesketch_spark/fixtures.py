"""Deterministic synthetic web-page corpus with planted duplicate clusters.

Mirrors the reference's synthetic-input machinery — the seeded Zipf rank
sampler (``util/async/ZipfGenerator.java:11-42``, rank ∝ 1/rank^s) that
drives its skewed flow-size traces — re-targeted at web pages: planted
duplicate-cluster sizes are Zipf-distributed, members are exact copies,
bounded-edit near-duplicates, or embedded-substring docs (FIXTURES.md §1).

Output shape is exactly BASELINE.json input_hint:
``documents(url string, warc_ts timestamp, html binary, text string,
lang string)`` plus ground-truth ``truth_pairs`` / ``truth_clusters``.
Everything is seeded; no external data.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

import numpy as np

_VOCAB_SIZE = 8192
_LANGS = ["en", "de", "fr", "es", "zh"]
_LANG_P = [0.9, 0.04, 0.03, 0.02, 0.01]
_EDIT_RATES = [0.01, 0.05, 0.1, 0.2]
_BASE_TS = datetime(2025, 1, 1)


def _vocab(rng: np.random.Generator) -> list[str]:
    """Seeded pseudo-word vocabulary."""
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lens = rng.integers(3, 11, size=_VOCAB_SIZE)
    return [
        "".join(rng.choice(letters, size=int(n))) for n in lens
    ]


def weibull_lengths(rng: np.random.Generator, n: int, shape: float = 1.5,
                    scale: float = 400.0, lo: int = 10, hi: int = 20_000) -> np.ndarray:
    """Weibull-distributed document lengths (tokens) — the reference ships a
    Weibull sampler for synthetic value traces (``util/async/Weibull.java:
    68-97``); web-page lengths are likewise heavy-tailed."""
    raw = scale * rng.weibull(shape, size=n)
    return np.clip(raw.astype(np.int64), lo, hi)


def zipf_sizes(rng: np.random.Generator, n_clusters: int, skew: float = 1.1,
               max_size: int = 64) -> np.ndarray:
    """Zipf-distributed cluster sizes (≥2), echoing ZipfGenerator.java:11-42:
    P(rank) ∝ 1/rank^skew over ranks 1..max_size-1, size = rank+1."""
    ranks = np.arange(1, max_size, dtype=np.float64)
    p = 1.0 / np.power(ranks, skew)
    p /= p.sum()
    return rng.choice(ranks.astype(np.int64), size=n_clusters, p=p) + 1


@dataclass
class Corpus:
    """Columnar synthetic corpus + ground truth."""

    url: list[str]
    warc_ts: list[datetime]
    html: list[bytes]
    text: list[str]
    lang: list[str]
    # ground truth
    truth_pairs: list[tuple[int, int, str]]        # (row1, row2, kind)
    truth_clusters: dict[int, int]                 # row -> planted cluster id

    def __len__(self) -> int:
        return len(self.url)

    def doc_rows(self) -> list[dict]:
        return [
            {
                "url": self.url[i],
                "warc_ts": self.warc_ts[i],
                "html": self.html[i],
                "text": self.text[i],
                "lang": self.lang[i],
            }
            for i in range(len(self.url))
        ]


def _seed_text(
    rng: np.random.Generator, vocab: list[str], lo: int = 200, hi: int = 2000
) -> list[str]:
    n = int(rng.integers(lo, hi + 1))
    idx = rng.integers(0, len(vocab), size=n)
    return [vocab[i] for i in idx]


def _edit(rng: np.random.Generator, vocab: list[str], toks: list[str],
          rate: float) -> list[str]:
    """Token substitutions/insertions/deletions at the given rate."""
    out: list[str] = []
    for t in toks:
        r = rng.random()
        if r < rate:
            op = rng.integers(0, 3)
            if op == 0:          # substitute
                out.append(vocab[int(rng.integers(0, len(vocab)))])
            elif op == 1:        # insert
                out.append(t)
                out.append(vocab[int(rng.integers(0, len(vocab)))])
            # op == 2: delete (skip)
        else:
            out.append(t)
    return out if out else toks[:1]


def generate_corpus(n_docs: int = 1000, seed: int = 42,
                    dup_fraction: float = 0.45,
                    substring_fraction: float = 0.05,
                    min_tokens: int = 200, max_tokens: int = 2000) -> Corpus:
    """Deterministic corpus: ~dup_fraction of rows live in planted
    exact/near clusters; ~substring_fraction are substring-only dups;
    the rest are singletons."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)

    texts: list[list[str]] = []
    truth_pairs: list[tuple[int, int, str]] = []
    truth_clusters: dict[int, int] = {}
    kinds: list[str] = []

    target_dup_rows = int(n_docs * dup_fraction)
    cluster_id = 0
    n_dup_rows = 0
    # planted exact/near clusters
    while n_dup_rows < target_dup_rows:
        size = int(zipf_sizes(rng, 1)[0])
        size = min(size, max(2, target_dup_rows // 4))
        seed_toks = _seed_text(rng, vocab, min_tokens, max_tokens)
        members: list[int] = []
        for m in range(size):
            if len(texts) >= n_docs:
                break
            row = len(texts)
            if m == 0:
                texts.append(seed_toks)
                kinds.append("seed")
            elif rng.random() < 0.4:
                texts.append(list(seed_toks))  # exact copy
                kinds.append("exact")
            else:
                rate = float(rng.choice(_EDIT_RATES))
                texts.append(_edit(rng, vocab, seed_toks, rate))
                kinds.append("near")
            members.append(row)
            truth_clusters[row] = cluster_id
            n_dup_rows += 1
        for a in range(len(members)):
            for b in range(a + 1, len(members)):
                ka, kb = kinds[members[a]], kinds[members[b]]
                kind = "exact" if (ka != "near" and kb != "near") else "near"
                truth_pairs.append((members[a], members[b], kind))
        cluster_id += 1
        if len(texts) >= n_docs:
            break

    # substring-only dups: ≥sa_min_len-token verbatim block inside unrelated text
    n_sub = int(n_docs * substring_fraction)
    i = 0
    while i + 1 < n_sub and len(texts) + 1 < n_docs:
        block_len = int(rng.integers(256, 513))
        idx = rng.integers(0, len(vocab), size=block_len)
        block = [vocab[j] for j in idx]
        r1, r2 = len(texts), len(texts) + 1
        for row in (r1, r2):
            host = _seed_text(rng, vocab, min_tokens, max_tokens)
            pos = int(rng.integers(0, len(host)))
            texts.append(host[:pos] + block + host[pos:])
            kinds.append("substring")
            truth_clusters[row] = cluster_id
        truth_pairs.append((r1, r2, "substring"))
        cluster_id += 1
        i += 2

    # singletons fill the remainder
    while len(texts) < n_docs:
        row = len(texts)
        texts.append(_seed_text(rng, vocab, min_tokens, max_tokens))
        kinds.append("singleton")
        truth_clusters[row] = cluster_id
        cluster_id += 1

    n = len(texts)
    site_ids = rng.integers(0, max(2, n // 20), size=n)
    paths = rng.integers(0, 1 << 48, size=n)
    urls = [
        f"https://site{site_ids[i]}.example/p{paths[i]:012x}-{i}" for i in range(n)
    ]
    ts_off = rng.integers(0, 365 * 24 * 3600, size=n)
    warc_ts = [_BASE_TS + timedelta(seconds=int(s)) for s in ts_off]
    lang_idx = rng.choice(len(_LANGS), size=n, p=_LANG_P)
    langs = [_LANGS[i] for i in lang_idx]
    text_strs = [" ".join(t) for t in texts]
    htmls = [b"<html><body>" + t.encode("utf-8") + b"</body></html>" for t in text_strs]

    return Corpus(
        url=urls, warc_ts=warc_ts, html=htmls, text=text_strs, lang=langs,
        truth_pairs=truth_pairs, truth_clusters=truth_clusters,
    )


def generate_corpus_spark(
    spark,
    n_docs: int,
    seed: int = 42,
    n_parts: int = 64,
    dup_fraction: float = 0.45,
    substring_fraction: float = 0.05,
    min_tokens: int = 200,
    max_tokens: int = 2000,
):
    """Distributed deterministic corpus: each partition generates its slice
    with an independent seeded rng (seed+part), so the whole corpus is
    reproducible at any parallelism and generation scales with cores.
    Planted duplicate clusters are partition-local (cluster truth is still
    exact); urls embed the partition so doc ids never collide.

    Returns a documents DataFrame in the input_hint shape + doc-level
    ``kind`` ground-truth column.
    """
    import pandas as pd

    per_part = [n_docs // n_parts] * n_parts
    for i in range(n_docs - sum(per_part)):
        per_part[i] += 1
    parts_df = spark.createDataFrame(
        [(i, per_part[i]) for i in range(n_parts)], "part int, n int"
    ).repartition(n_parts, "part")

    def gen(batches):
        for pdf in batches:
            for part, n in zip(pdf["part"], pdf["n"]):
                if n <= 0:
                    continue
                c = generate_corpus(
                    n_docs=int(n), seed=seed + int(part),
                    dup_fraction=dup_fraction,
                    substring_fraction=substring_fraction,
                    min_tokens=min_tokens, max_tokens=max_tokens,
                )
                urls = [u.replace("https://", f"https://part{part}.") for u in c.url]
                yield pd.DataFrame(
                    {
                        "url": urls,
                        "warc_ts": c.warc_ts,
                        "html": c.html,
                        "text": c.text,
                        "lang": c.lang,
                    }
                )

    return parts_df.mapInPandas(
        gen,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


def corpus_to_spark(spark, corpus: Corpus):
    """documents DataFrame in exactly the input_hint shape."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ])
    return spark.createDataFrame(corpus.doc_rows(), schema=schema)
