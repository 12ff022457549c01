"""Shared MinHash/LSH kernel for NIL-mention cross-doc clustering (T4b).

north_star: "cross-document entity linking via MinHash/LSH candidate
blocking".  The SAME code runs single-node in the oracle and inside the
Spark pandas UDF (gaia_spark/operators/linking.py), so the candidate
pair sets are identical by construction — blocking recall differences
can never cause oracle/Spark divergence.

Determinism: base hash = crc32 (stable across platforms/Python builds,
unlike ``hash()``), universal-hash coefficients drawn once from a seeded
RNG at import. numpy-vectorized so the Spark side stays Arrow-batched.
"""

from __future__ import annotations

import random
import zlib

import numpy as np

_P = (1 << 61) - 1  # Mersenne prime for universal hashing
N_HASHES = 32
N_BANDS = 8
ROWS_PER_BAND = N_HASHES // N_BANDS

_rng = random.Random(0x5A17)
_A = np.array([_rng.randrange(1, _P) for _ in range(N_HASHES)], dtype=np.uint64)
_B = np.array([_rng.randrange(0, _P) for _ in range(N_HASHES)], dtype=np.uint64)


def char_shingles(s: str, k: int = 3) -> set[str]:
    """Character k-shingles of a normalized surface (padded if short)."""
    if len(s) < k:
        return {s} if s else set()
    return {s[i : i + k] for i in range(len(s) - k + 1)}


def base_hashes(shingles: set[str]) -> np.ndarray:
    return np.array(
        sorted(zlib.crc32(sh.encode("utf-8")) for sh in shingles), dtype=np.uint64
    )


def minhash_signature(shingles: set[str]) -> list[int]:
    """n_hashes-wide MinHash signature. Empty input → all-zero signature."""
    if not shingles:
        return [0] * N_HASHES
    h = base_hashes(shingles)  # (m,)
    # (n_hashes, m): (a*h + b) mod p, minimum over shingles
    vals = (_A[:, None] * h[None, :] + _B[:, None]) % np.uint64(_P)
    return [int(v) for v in vals.min(axis=1)]


def band_keys(sig: list[int]) -> list[int]:
    """LSH band keys: crc32 over each band's packed rows."""
    out = []
    for b in range(N_BANDS):
        rows = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
        raw = b.to_bytes(2, "big") + b"".join(r.to_bytes(8, "big") for r in rows)
        out.append(zlib.crc32(raw))
    return out


def blocking_keys(norm: str) -> list[int]:
    """Candidate-blocking keys for a normalized surface: MinHash/LSH band
    keys over char 3-shingles PLUS exact-token keys (len ≥ 4).  Token keys
    catch subset-containment pairs whose Jaccard is too low for the bands
    ("kestrel" ⊂ "kestrel logistics"); at 10^12 scale, oversized token
    blocks are capped Spark-side (see gaia_spark/operators/linking.py).
    Verification (containment ≥ threshold) always has the final say."""
    keys = band_keys(minhash_signature(char_shingles(norm)))
    for tok in set(norm.split()):
        if len(tok) >= 4:
            keys.append(zlib.crc32(b"tok:" + tok.encode("utf-8")))
    return sorted(set(keys))


def shingle_containment(a: set[str], b: set[str]) -> float:
    """|A∩B| / min(|A|,|B|) — the pair-verification score (pinned ≥ 0.6)."""
    if not a or not b:
        return 0.0
    return len(a & b) / min(len(a), len(b))


CONTAINMENT_THRESHOLD = 0.6
