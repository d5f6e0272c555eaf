"""Deterministic alias-dictionary synthesis + char-3-gram MinHash banding
(FIXTURES.md §3, SURVEY.md §2.3 L2/L3).

Pure python/numpy — shared verbatim by the Spark operators and the pandas
oracle so both sides see the same dictionary and the same LSH candidate
sets (which makes link parity exact rather than statistical). No external
data: the dictionary derives from the corpus's own token distribution.
"""

from __future__ import annotations

import numpy as np

from .text import fnv1a64, normalize_surface

ENTITY_ID_MASK = 0x7FFFFFFFFFFFFFFF


def entity_id(name: str) -> int:
    return fnv1a64("ent:" + name) & ENTITY_ID_MASK


def surface_node_id(norm: str) -> int:
    """Node id for an (unlinked) normalized surface form — deterministic,
    disjoint from entity ids by construction prefix."""
    return fnv1a64("surf:" + norm) & ENTITY_ID_MASK


def build_alias_rows(token_counts: list[tuple[str, int]],
                     top_k: int = 200) -> list[dict]:
    """alias_dict rows from (token, count) pairs sorted deterministically.

    - one canonical entity per top token and per adjacent two-token combo;
    - every 20th alias is ambiguous (also maps to the next entity, lower
      prior) — exercises the top-1 window;
    - every 10th entity gets a misspelled variant (last char doubled,
      char-3-gram Jaccard ≥ 0.9-ish) — exercises MinHash-LSH recall.
    """
    toks = sorted(token_counts, key=lambda tc: (-tc[1], tc[0]))[:top_k]
    names = [t for t, _ in toks]
    names += [f"{names[i]} {names[i + 1]}" for i in range(min(50, len(names) - 1))]
    rows: list[dict] = []
    for rank, name in enumerate(names):
        norm = normalize_surface(name)
        eid = entity_id(name)
        prior = round(1.0 / (1.0 + 0.01 * rank), 6)
        rows.append({"alias_norm": norm, "entity_id": eid, "prior": prior})
        if rank % 20 == 10 and rank + 1 < len(names):
            rows.append({"alias_norm": norm,
                         "entity_id": entity_id(names[rank + 1]),
                         "prior": round(prior * 0.5, 6)})
        if rank % 10 == 5 and len(norm) >= 3:
            rows.append({"alias_norm": norm + norm[-1],
                         "entity_id": eid,
                         "prior": round(prior * 0.9, 6)})
    # dedup on (alias_norm, entity_id) keeping max prior, deterministically
    best: dict[tuple[str, int], float] = {}
    for r in rows:
        k = (r["alias_norm"], r["entity_id"])
        best[k] = max(best.get(k, 0.0), r["prior"])
    return [{"alias_norm": a, "entity_id": e, "prior": p}
            for (a, e), p in sorted(best.items())]


def token_counts_from_texts(texts) -> list[tuple[str, int]]:
    counts: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    return sorted(counts.items())


# --- char-3-gram MinHash banding for fuzzy blocking -------------------------

LSH_NUM_HASHES = 32
LSH_BANDS = 8
LSH_ROWS = LSH_NUM_HASHES // LSH_BANDS
_MERSENNE = (1 << 61) - 1
_A: np.ndarray | None = None
_B: np.ndarray | None = None


def _params():
    global _A, _B
    if _A is None:
        rng = np.random.default_rng(42)
        _A = rng.integers(1, _MERSENNE, size=LSH_NUM_HASHES, dtype=np.int64)
        _B = rng.integers(0, _MERSENNE, size=LSH_NUM_HASHES, dtype=np.int64)
    return _A, _B


def char_shingles(norm: str, n: int = 3) -> list[str]:
    s = f"^{norm}$"
    if len(s) < n:
        return [s]
    return sorted({s[i:i + n] for i in range(len(s) - n + 1)})


def band_keys(norm: str) -> list[int]:
    """LSH_BANDS band keys over char-3-gram minhashes of a normalized
    surface; same function on mention side and alias side ⇒ symmetric
    blocking."""
    sh = char_shingles(norm)
    a, b = _params()
    h = np.array([fnv1a64(s) & ENTITY_ID_MASK for s in sh], dtype=np.uint64)
    vals = (h[None, :] * a.astype(np.uint64)[:, None]
            + b.astype(np.uint64)[:, None]) % np.uint64(_MERSENNE)
    mins = vals.min(axis=1)
    keys = []
    for bi in range(LSH_BANDS):
        key = fnv1a64(f"aband{bi}")
        for v in mins[bi * LSH_ROWS:(bi + 1) * LSH_ROWS]:
            key = ((key * 1099511628211) & 0xFFFFFFFFFFFFFFFF) ^ int(v)
        keys.append(key & ENTITY_ID_MASK)
    return keys


def round6(x: float) -> float:
    """HALF_UP rounding to 6 dp — matches Spark's F.round semantics (python
    built-in round is banker's)."""
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def jaccard(a: list[str], b: list[str]) -> float:
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)
