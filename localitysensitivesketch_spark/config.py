"""Pinned sketch configuration — the single config hub.

Analogue of the reference's ``control/LogicController.java:29-112`` (one
static class holding every sketch parameter: NumberFlowsPerPeriod,
clusterCount, bucketCount, expectedFP, FingerLen, batching knobs).  Here a
frozen dataclass pins every parameter that affects signature values, band
decomposition, candidate generation and clustering, so that cluster
assignments reproduce exactly at a fixed config (the reference's
"same-config ⇒ same clusters" property; BASELINE.json north_rule).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class SketchConfig:
    """Every value that changes signatures or clusters lives here."""

    # --- text → shingles (reference key projection analogue,
    #     Ingest/Pub4PCapStreamKVTable.java:405-503 headerChoice) ---
    normalization: str = "lower_ws"  # lower + whitespace tokenize
    shingle_k: int = 5               # word shingles

    # --- MinHash (reference seeded xxHash64 family,
    #     Sketching/LSSFingerprintAtomic.java:148-151,554-572) ---
    # bands/rows sized so detection at the verification threshold is
    # near-certain: P(≥1 band | J=0.707) = 1-(1-J⁴)³² ≈ 0.9999 (at 16×8 the
    # S-curve midpoint sits AT the threshold → only ~63% there, measured
    # recall 0.9875 at 3k docs).  Verify is exact, so the extra low-J
    # candidates cost throughput, never precision.
    n_hashes: int = 128
    bands: int = 32
    rows: int = 4                    # bands * rows == n_hashes

    # --- SimHash (reference fingerprint projection,
    #     LSSFingerprintAtomic.java:382-414, FingerLen=16 → ours 64-bit) ---
    simhash_bits: int = 64
    hamming_radius: int = 3

    # --- verification / clustering thresholds ---
    # pinned independently of the band geometry: the 32×4 S-curve midpoint
    # is (1/32)^(1/4) ≈ 0.42, deliberately far below this threshold so
    # detection at J=0.707 is ~0.9999 (see bands/rows note above)
    jaccard_threshold: float = 0.707

    # --- suffix-array exact-substring pass (north_rule; no ref analogue) ---
    sa_min_len: int = 256              # tokens of verbatim overlap
    sa_group_cap: int = 2000           # max docs per SA group

    # --- skew handling (north_rule: explicit) ---
    band_width_cap: int = 5000         # drop band buckets wider than this
    salt_factor: int = 16              # salting for residual join skew

    # --- hashing seeds ---
    seed: int = 42

    # --- windowed analytics (reference count-tumbling window,
    #     Sub4SketchingKVStream.java:384-394; NumberFlowsPerPeriod=10000) ---
    window_n: int = 10_000

    def __post_init__(self) -> None:
        if self.bands * self.rows != self.n_hashes:
            raise ValueError(
                f"bands*rows ({self.bands}*{self.rows}) != n_hashes ({self.n_hashes})"
            )

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "SketchConfig":
        return cls(**json.loads(s))


DEFAULT_CONFIG = SketchConfig()
