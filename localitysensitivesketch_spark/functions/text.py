"""Text normalization / tokenization — the "key projection" layer.

Analogue of the reference's 5 flow-key projections selected by
``headerChoice`` (``Ingest/Pub4PCapStreamKVTable.java:405-503``): which view
of the raw record feeds the sketch.  For web text the projections are
normalization choices.  The raw ``text`` column is never rewritten
(input_hint invariant: byte-identical extracted text per url) — every
projection is a derived value.
"""

from __future__ import annotations

import re

_WS_RE = re.compile(r"\s+")
_TAG_RE = re.compile(r"<[^>]*>")
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)


def tokenize(text: str, normalization: str = "lower_ws") -> list[str]:
    """Deterministic tokenizer; `normalization` selects the projection
    (reference headerChoice 1..5 analogue)."""
    if text is None:
        return []
    if normalization == "raw_ws":
        s = text
    elif normalization == "lower_ws":
        s = text.lower()
    elif normalization == "strip_tags":
        s = _TAG_RE.sub(" ", text).lower()
    elif normalization == "alnum":
        s = _PUNCT_RE.sub(" ", text.lower())
    else:
        raise ValueError(f"unknown normalization: {normalization}")
    return [t for t in _WS_RE.split(s) if t]
