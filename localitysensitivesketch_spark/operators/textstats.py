"""Text-analysis operators for a training-data pipeline.

These are the corpus-hygiene operators a 100 TB web-text pipeline runs
before/alongside dedup: token counting, quality scoring, language
identification, document fingerprinting.  The reference's analogue is its
key-projection + fingerprint layer (``Ingest/Pub4PCapStreamKVTable.java:
405-503`` headerChoice projections; ``Sketching/LSSFingerprintAtomic.java:
382-414`` fingerprint compression) — a cheap per-record derivation computed
inline with ingestion.

Everything here is built-in ``pyspark.sql.functions`` (JVM-side, inside
whole-stage codegen — no Python in the hot path), so each operator has an
exact ANSI-SQL oracle and pushes column pruning down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deliberately simple and deterministic — the operator's value is the
# *shape* (scored projection, argmax over broadcast lexicons), not NLP
# accuracy; swap lexicons for real ones in production.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
}

# escaped for use inside an F.expr SQL string literal (regexp_extract_all
# has no Column-pattern overload) — NOT dead code
_PUNCT_PAT = r"[^\\w\\s]"

# BPE-style pre-tokenizer classes (the GPT-2 pattern's shape minus the
# RE2-unsupported lookahead, so the exact same pattern runs in Spark's
# Java regex AND the DuckDB/RE2 oracle): letter runs, digit runs,
# punctuation runs.  A subword tokenizer's token count is proportional to
# the count under this pre-split, which is what a corpus-sizing pass needs.
_BPE_PAT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: str = "ws",
) -> DataFrame:
    """Token counting: whitespace tokens (``tokenizer="ws"``) or BPE-style
    pre-tokenization (``"bpe"`` — letter/digit/punctuation runs, the
    GPT-2 pre-split shape), distinct tokens, chars, avg token length.
    All codegen'd string ops on the pruned (id, text) projection."""
    if tokenizer == "ws":
        toks = F.split(F.trim(F.col(text_col)), r"\s+")
    elif tokenizer == "bpe":
        toks = F.regexp_extract_all(F.col(text_col), F.lit(_BPE_PAT), 0)
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r} (ws|bpe)")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.round(
            F.try_divide(F.length(F.col(text_col)), F.size(toks)), 6
        ).alias("chars_per_token"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality scoring: length, punctuation ratio, stopword ratio, uppercase
    ratio → a composite [0,1] score.  A Gopher/C4-style rule filter shape."""
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = F.split(F.trim(text), r"\s+")
    n_tokens = F.size(toks)
    n_punct = F.size(F.expr(f"regexp_extract_all({text_col}, '{_PUNCT_PAT}', 0)"))
    n_stop = F.size(
        F.expr(
            f"filter(split(lower(trim({text_col})), '\\\\s+'), "
            "t -> t IN ('the','and','of','to','in','a','is'))"
        )
    )
    n_upper = F.size(F.expr(f"regexp_extract_all({text_col}, '[A-Z]', 0)"))
    punct_ratio = n_punct / n_chars
    stop_ratio = n_stop / n_tokens
    upper_ratio = n_upper / n_chars
    len_ok = (n_tokens >= 10) & (n_tokens <= 100000)
    score = (
        F.when(len_ok, 0.4).otherwise(0.0)
        + F.when(punct_ratio < 0.2, 0.2).otherwise(0.0)
        + F.when(stop_ratio > 0.01, 0.2).otherwise(0.0)
        + F.when(upper_ratio < 0.3, 0.2).otherwise(0.0)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(upper_ratio, 6).alias("upper_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


_U31 = 2_147_483_648  # 2^31 — centers a u32 hash to a signed weight


def hashed_linear_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    dim: int | None = None,
    weights: list[float] | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """fastText/CCNet-style hashed linear document classifier: the score is
    the mean over tokens of a weight looked up by token hash — the shape
    every learned quality/domain filter in a web-corpus pipeline takes
    (hash the token, index a weight table, average, threshold).

    Two weight sources:

    * ``weights=[...]`` with ``dim=len(weights)`` — a trained weight
      vector, embedded as an array literal so the lookup
      (``weights[h(token) % dim]``) runs inside whole-stage codegen with
      no join and no broadcast variable;
    * default (no weights) — weights derived from the seeded md5 family
      itself: ``w(t) = u32(md5(t:seed)) - 2^31``, summed EXACTLY as
      64-bit integers with one trailing division, so the score is
      bit-deterministic across engines and partitionings (this is the
      oracle-checked path; a real deployment swaps in trained weights
      through the identical plan).

    Map-only: no shuffle, no state, column-pruned scan.  Returns
    ``(doc_id, n_tokens, score, keep)``; empty documents score NULL and
    are not kept.
    """
    text = F.col(text_col)
    toks = F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != F.lit("")
    )
    n = F.size(toks)

    def u32(t):
        return F.conv(
            F.substring(F.md5(F.concat_ws(":", t, F.lit(str(seed)))), 1, 8),
            16,
            10,
        ).cast("long")

    if weights is not None:
        if dim is None:
            dim = len(weights)
        if dim != len(weights):
            raise ValueError(f"dim={dim} != len(weights)={len(weights)}")
        warr = F.array(*[F.lit(float(w)) for w in weights])
        total = F.aggregate(
            toks,
            F.lit(0.0),
            lambda acc, t: acc + F.element_at(warr, (u32(t) % dim + 1).cast("int")),
        )
        score = F.round(F.try_divide(total, n), 6)
    else:
        total = F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + (u32(t) - F.lit(_U31))
        )
        score = F.round(F.try_divide(total, n * F.lit(_U31)), 6)
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        score.alias("score"),
        F.coalesce(score > F.lit(threshold), F.lit(False)).alias("keep"),
    )


def train_language_model(
    labeled: list[tuple[str, str]],
    dim: int = 1024,
    seed: int = 42,
    alpha: float = 0.5,
) -> dict:
    """Train hashed naive-Bayes log-odds weights for :func:`language_id`'s
    model path from a small labeled sample ``[(lang, text), ...]``.

    Pure driver-side python (a language-ID training set is thousands of
    short snippets — never cluster-scale); the OUTPUT is what scales: a
    ``{lang: [dim floats]}`` weight table embedded into codegen, so
    inference is a map-only pass regardless of corpus size.  Token hashing
    uses the same seeded-md5 u32 family as :func:`hashed_linear_score`, so
    train-time bucket ids match the Spark-side lookup bit-for-bit.

    ``w[lang][b] = log P(b|lang) - log P(b|background)`` with add-``alpha``
    smoothing; a doc's per-language score is the mean over tokens, argmax
    wins.  Deterministic for fixed inputs.
    """
    import hashlib
    import math
    from collections import Counter

    def bucket(tok: str) -> int:
        h = hashlib.md5(f"{tok}:{seed}".encode()).hexdigest()[:8]
        return int(h, 16) % dim

    per_lang: dict[str, Counter] = {}
    background: Counter = Counter()
    for lang, text in labeled:
        toks = [t for t in text.lower().strip().split() if t]
        c = per_lang.setdefault(lang, Counter())
        for t in toks:
            b = bucket(t)
            c[b] += 1
            background[b] += 1
    bg_total = sum(background.values())
    weights: dict[str, list[float]] = {}
    for lang, c in sorted(per_lang.items()):
        total = sum(c.values())
        weights[lang] = [
            math.log((c.get(b, 0) + alpha) / (total + alpha * dim))
            - math.log((background.get(b, 0) + alpha) / (bg_total + alpha * dim))
            for b in range(dim)
        ]
    return {"dim": dim, "seed": seed, "weights": weights}


def language_id(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    model: dict | None = None,
) -> DataFrame:
    """Language identification with two interchangeable scorers behind one
    plan shape (per-language score columns → ``greatest`` argmax, all
    map-only whole-stage codegen — no join, no shuffle, no Python):

    * default — marker-word heuristic: count hits per tiny per-language
      lexicon (the oracle-checkable contract path; 'und' when all zero);
    * ``model=`` a :func:`train_language_model` dict — trained hashed
      naive-Bayes weights, one ``weights[h(token) % dim]`` array-literal
      lookup per language (the :func:`hashed_linear_score` machinery), so
      real fastText-style language ID rides the exact same map-only plan.

    Output schema is ``(doc_id, score_<lang>..., pred_lang)`` either way;
    the model path's scores are mean log-odds (double), the heuristic's
    are hit counts (long).
    """
    text = F.col(text_col)
    if model is not None:
        dim = int(model["dim"])
        seed = int(model.get("seed", 42))
        toks = F.filter(
            F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != F.lit("")
        )
        n = F.size(toks)

        def u32(t):
            return F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", t, F.lit(str(seed)))), 1, 8
                ),
                16,
                10,
            ).cast("long")

        def model_score(w: list[float]):
            if len(w) != dim:
                raise ValueError(f"weights len {len(w)} != dim {dim}")
            warr = F.array(*[F.lit(float(x)) for x in w])
            total = F.aggregate(
                toks,
                F.lit(0.0),
                lambda acc, t: acc
                + F.element_at(warr, (u32(t) % dim + 1).cast("int")),
            )
            return F.try_divide(total, n)

        scores = {
            lang: model_score(w) for lang, w in sorted(model["weights"].items())
        }
        langs = sorted(model["weights"])
        best = F.greatest(*[scores[l] for l in langs]) if len(langs) > 1 else scores[langs[0]]
        pred = F.lit("und")
        for lang in reversed(langs):
            pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
        pred = F.when(n > 0, pred).otherwise(F.lit("und"))
        return df.select(
            F.col(id_col).alias("doc_id"),
            *[F.round(scores[l], 6).alias(f"score_{l}") for l in langs],
            pred.alias("pred_lang"),
        )

    toks = F.split(F.lower(F.trim(text)), r"\s+")

    def marker_score(markers: list[str]):
        arr = F.array(*[F.lit(w) for w in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = {lang: marker_score(m) for lang, m in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[l] for l in langs])
    pred = F.lit("und")
    # first language (in fixed order) achieving the max — deterministic
    for lang in reversed(langs):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    out = df.select(
        F.col(id_col).alias("doc_id"),
        *[scores[l].cast("long").alias(f"score_{l}") for l in langs],
        pred.alias("pred_lang"),
    )
    return out


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprinting (``LSSFingerprintAtomic.java:382-414``
    analogue): compress the document to short stable fingerprints — a
    16-hex-char content hash plus a 64-bit xxhash64.  Used as the exact-dup
    key and as a cheap equality prefilter before any pairwise work."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.substring(F.md5(F.col(text_col)), 1, 16).alias("fp_hex"),
        F.xxhash64(F.col(text_col)).alias("fp64"),
    )
