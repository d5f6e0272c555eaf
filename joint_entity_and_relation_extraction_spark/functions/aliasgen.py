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


# --- batch-vectorized surface features (r04) --------------------------------
#
# band_keys/surface_node_id above are the per-row REFERENCE kernels the
# pandas oracle uses. The Spark UDF path calls the batch versions below,
# which compute the identical values with numpy over the whole Arrow
# batch (per-row python FNV over every shingle made the linking stage the
# pipeline's second-largest cost at sf0.1 — same failure mode as the r02
# per-row minhash, VERDICT r02 #1). Bit-identity per-row == batch is
# pinned by tests/test_linking.py.

_FNV64_OFFSET = np.uint64(14695981039346656037)
_FNV64_PRIME = np.uint64(1099511628211)

#: pooled work buffer for the (LSH_NUM_HASHES, n_shingles) universal-hash
#: matrix — fresh multi-MB allocations page-fault at ~0.15 GB/s on this
#: host (CLAUDE.md invariants); never return views of it
_AG_POOL: dict = {}


def fnv1a64_batch(strings: list[str]) -> np.ndarray:
    """Vectorized fnv1a64 over a list of strings: iterate byte POSITIONS
    (bounded by the longest string) applying the fold to every string
    still live at that position — identical left-to-right byte fold,
    uint64 wraparound == the reference's & 0xFFFF...F mask."""
    n = len(strings)
    out = np.full(n, _FNV64_OFFSET, dtype=np.uint64)
    if n == 0:
        return out
    bs = [s.encode("utf-8") for s in strings]
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=n)
    if not lens.any():
        return out
    flat = np.frombuffer(b"".join(bs), dtype=np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    for j in range(int(lens.max())):
        idx = np.flatnonzero(lens > j)
        byts = flat[starts[idx] + j].astype(np.uint64)
        out[idx] = (out[idx] ^ byts) * _FNV64_PRIME
    return out


def _mod_mersenne(v: np.ndarray) -> np.ndarray:
    """x mod (2^61-1) for 64-bit values WITHOUT integer division (numpy's
    uint64 ``%`` is a scalar C division loop — measured ~10x the cost of
    the multiply it follows). For v < 2^64: v = hi*2^61 + lo with
    hi = v>>61 ≤ 7, so v mod M = (hi + lo) mod M and hi+lo ≤ M+7 needs at
    most one subtraction. Bit-equal to ``%`` (pinned by the parity test
    through band_keys)."""
    m = np.uint64(_MERSENNE)
    s = (v & m) + (v >> np.uint64(61))
    return np.where(s >= m, s - m, s)


#: per-shingle minhash-column cache: char-3-gram vocabulary is tiny
#: (charset³-bounded) and repeats across every surface, so the 32
#: universal hashes are computed once per DISTINCT shingle and reused —
#: the uncached path did 32 mul+add+mod per shingle OCCURRENCE, which
#: made the linking stage the pipeline's second-largest cost. The cap is
#: a MEMORY bound, not just an entry count (ADVICE r04): each cached
#: shingle costs 32 x 8 B of table row, so 2^17 entries bound _SH_TABLE
#: at 32 MB per python worker (≤48 MB transiently while the table
#: doubles) — multi-GB at local[32] was possible at the old 2^20 cap on
#: a multilingual corpus whose char-3-gram vocabulary actually grows
#: that large. ASCII web text needs ~10^5 shingles (fits); an overflow
#: vocabulary degrades to the uncached per-batch path below, which is
#: value-identical.
_SH_CACHE: dict[str, int] = {}
_SH_CACHE_CAP = 1 << 17
_SH_TABLE: np.ndarray | None = None  # (LSH_NUM_HASHES, capacity)
_SH_USED = 0


def _shingle_columns(distinct_new: list[str]) -> None:
    """Append minhash rows for new distinct shingles to the table.

    ROW-major layout (shingle, hash): the hot gather copies one
    contiguous 32-value row per shingle occurrence. The transposed
    (hash, shingle) layout made np.take write 32 pages per occurrence —
    measured 17s instead of ~0.3s for the same bytes on this host."""
    global _SH_TABLE, _SH_USED
    k = len(distinct_new)
    h = fnv1a64_batch(distinct_new) & np.uint64(ENTITY_ID_MASK)
    a, b = _params()
    vals = _mod_mersenne(h[:, None] * a.astype(np.uint64)[None, :]
                         + b.astype(np.uint64)[None, :])  # (k, H)
    if _SH_TABLE is None:
        _SH_TABLE = np.empty((1 << 16, LSH_NUM_HASHES), dtype=np.uint64)
    while _SH_USED + k > _SH_TABLE.shape[0]:
        grown = np.empty((2 * _SH_TABLE.shape[0], LSH_NUM_HASHES),
                         dtype=np.uint64)
        grown[:_SH_USED] = _SH_TABLE[:_SH_USED]
        _SH_TABLE = grown
    _SH_TABLE[_SH_USED:_SH_USED + k] = vals
    for i, s in enumerate(distinct_new):
        _SH_CACHE[s] = _SH_USED + i
    _SH_USED += k


def surface_feats_batch(norms: list[str]
                        ) -> tuple[np.ndarray, list[list[str]], np.ndarray]:
    """(band_keys (n, LSH_BANDS) int64, char_shingles per row, node ids
    (n,) int64) for a batch of normalized surfaces — value-identical to
    [band_keys(s)], [char_shingles(s)], [surface_node_id(s)]."""
    n = len(norms)
    sh_lists = [char_shingles(s) for s in norms]
    if n == 0:
        return (np.empty((0, LSH_BANDS), dtype=np.int64), sh_lists,
                np.empty(0, dtype=np.int64))
    flat_sh = [s for sh in sh_lists for s in sh]
    w = len(flat_sh)
    buf = _AG_POOL.get("hash")
    if buf is None or buf.shape[0] < w:
        buf = _AG_POOL["hash"] = np.empty(
            (max(w, 1 << 16), LSH_NUM_HASHES), dtype=np.uint64)
    work = buf[:w]
    # single pass over occurrences: resolve cached indices and collect
    # misses together (a separate membership scan re-pays the dict
    # lookup for all 6M+ occurrences)
    idx = np.empty(w, dtype=np.int64)
    miss: list[str] = []
    lookup = _SH_CACHE.get
    for j, s in enumerate(flat_sh):
        v = lookup(s, -1)
        if v < 0:
            miss.append(s)
        idx[j] = v
    new = sorted(set(miss))
    if not new or len(_SH_CACHE) + len(new) <= _SH_CACHE_CAP:
        if new:
            _shingle_columns(new)
            for j, s in enumerate(flat_sh):
                if idx[j] < 0:
                    idx[j] = _SH_CACHE[s]
        np.take(_SH_TABLE, idx, axis=0, out=work)
    else:
        # adversarial vocabulary blew the cache cap: compute this batch
        # directly (still with the fast Mersenne fold), cache untouched
        h = fnv1a64_batch(flat_sh) & np.uint64(ENTITY_ID_MASK)
        a, b = _params()
        np.multiply(h[:, None], a.astype(np.uint64)[None, :], out=work)
        work += b.astype(np.uint64)[None, :]
        work[:] = _mod_mersenne(work)
    lens = np.fromiter((len(sh) for sh in sh_lists), dtype=np.int64, count=n)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    mins = np.minimum.reduceat(work, offsets, axis=0)  # (n, H) — a copy
    keys = np.empty((n, LSH_BANDS), dtype=np.uint64)
    for bi in range(LSH_BANDS):
        key = np.full(n, np.uint64(fnv1a64(f"aband{bi}")), dtype=np.uint64)
        for r in range(LSH_ROWS):
            key = (key * np.uint64(1099511628211)) ^ mins[:, bi * LSH_ROWS + r]
        keys[:, bi] = key & np.uint64(ENTITY_ID_MASK)
    nodes = (fnv1a64_batch([f"surf:{s}" for s in norms])
             & np.uint64(ENTITY_ID_MASK)).astype(np.int64)
    return keys.astype(np.int64), sh_lists, nodes


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
