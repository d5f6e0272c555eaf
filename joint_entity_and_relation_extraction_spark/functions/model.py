"""Deterministic numpy re-realization of the reference's joint model shape.

The reference stacks a BERT encoder + BiLSTM, a span-tagging (BIOES) NER
head, and a biaffine relation-classification head (BASELINE.json north_star;
SURVEY.md §2.2 X5–X7, [PK-H/M]). torch/transformers are unavailable offline
(SURVEY.md §0.4), so the *computation shape* is re-realized with frozen
seeded weights: embedding lookup → sinusoidal positions → context mixing →
BiLSTM recurrence → BIOES tag head → biaffine ordered-pair scorer.

The single-process run of THIS code is the grading oracle for the
P/R >= 0.95 gate (SURVEY.md §0.2, §5.2) — the Spark path must reproduce it
exactly under any partitioning / Arrow batch size (test T2).

Determinism notes: all math is float64; each sentence is encoded
independently (no cross-sentence batching/padding), so results are
independent of how rows are grouped into Arrow batches; argmax tie-break is
numpy's lowest-index rule. NO pyspark imports here.
"""

from __future__ import annotations

import os

# single-threaded BLAS: the matrices here are 64–128 wide, where thread
# fan-out costs far more than it saves (observed 74s sys-time on sf0.001);
# Spark supplies the parallelism across partitions instead. Must be set
# before numpy initializes its threadpools in each python worker.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import numpy as np  # noqa: E402

from .text import VOCAB_SIZE

SEED = 42
D = 64          # embedding dim
H = 64          # LSTM hidden per direction
NDIRS_H = 2 * H  # BiLSTM output width

# CoNLL04-family label sets ([PK-H], used as label vocabulary only)
ENT_LABELS = ["PEOP", "ORG", "LOC", "OTHER"]
REL_LABELS = ["WORK_FOR", "LIVE_IN", "LOCATED_IN", "ORGBASED_IN", "KILL"]
NONE_REL = len(REL_LABELS)  # index of the NONE class

# BIOES tag space: O + {B,I,E,S} x entity type
TAG_O = 0
_BIOES = ["B", "I", "E", "S"]
TAGS = ["O"] + [f"{p}-{lab}" for lab in ENT_LABELS for p in _BIOES]
NTAGS = len(TAGS)

MAX_MENTIONS = 20  # cap per sentence; bounds the O(M^2) pair scorer


class _Weights:
    """Frozen seeded weights, built lazily once per process (Spark python
    workers each build them on first use — ~15 MB, amortized via the
    iterator-of-batches mapInPandas pattern, SURVEY.md §2.5)."""

    def __init__(self) -> None:
        rng = np.random.default_rng(SEED)
        s = 0.1
        self.emb = rng.standard_normal((VOCAB_SIZE, D)) * s
        self.Wc = rng.standard_normal((D, D)) * s        # token proj
        self.Wg = rng.standard_normal((D, D)) * s        # global-context proj
        self.bc = rng.standard_normal(D) * s
        # BiLSTM: [Wx (D,4H), Wh (H,4H), b (4H)] per direction; gate order i,f,g,o
        self.fw = (rng.standard_normal((D, 4 * H)) * s,
                   rng.standard_normal((H, 4 * H)) * s,
                   rng.standard_normal(4 * H) * s)
        self.bw = (rng.standard_normal((D, 4 * H)) * s,
                   rng.standard_normal((H, 4 * H)) * s,
                   rng.standard_normal(4 * H) * s)
        self.Wtag = rng.standard_normal((NDIRS_H, NTAGS)) * s
        self.btag = rng.standard_normal(NTAGS) * s
        nrel = len(REL_LABELS) + 1
        self.Wbil = rng.standard_normal((nrel, NDIRS_H, NDIRS_H)) * (s / 8)
        self.Wlin = rng.standard_normal((nrel, 2 * NDIRS_H)) * s
        self.brel = rng.standard_normal(nrel) * s  # kept for weight-shape
        # parity; the decision rule uses centered scores + REL_TAU instead
        # positional encodings (precomputed, max sentence length 512)
        pos = np.arange(512)[:, None]
        i = np.arange(D // 2)[None, :]
        ang = pos / np.power(10000.0, 2 * i / D)
        pe = np.zeros((512, D))
        pe[:, 0::2] = np.sin(ang)
        pe[:, 1::2] = np.cos(ang)
        self.pe = pe


_W: _Weights | None = None


def weights() -> _Weights:
    global _W
    if _W is None:
        _W = _Weights()
    return _W


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _lstm_pass(x: np.ndarray, params, reverse: bool) -> np.ndarray:
    Wx, Wh, b = params
    T = x.shape[0]
    pre_x = x @ Wx + b  # (T, 4H) — input contribution precomputed
    h = np.zeros(H)
    c = np.zeros(H)
    out = np.zeros((T, H))
    order = range(T - 1, -1, -1) if reverse else range(T)
    for t in order:
        g = pre_x[t] + h @ Wh
        # one vectorized sigmoid over all gates (elementwise ⇒ bitwise
        # identical to per-slice calls; the g-gate slice of `s` is unused)
        s = _sigmoid(g)
        i, f, o = s[:H], s[H : 2 * H], s[3 * H :]
        c = f * c + i * np.tanh(g[2 * H : 3 * H])
        h = o * np.tanh(c)
        out[t] = h
    return out


def encode(ids: list[int] | np.ndarray) -> np.ndarray:
    """token ids → (T, 2H) contextual states.

    embedding lookup → sinusoidal position add → global-context mixing
    (the offline stand-in for BERT self-attention) → BiLSTM fwd+bwd concat
    (the reference's BiLSTM-on-BERT stack, SURVEY.md §2.2 X5).
    """
    w = weights()
    ids = np.asarray(ids, dtype=np.int64)
    T = ids.shape[0]
    x = w.emb[ids] + w.pe[:T]
    g = x.mean(axis=0)  # global context vector (deterministic, O(T))
    x = np.tanh(x @ w.Wc + (g @ w.Wg)[None, :] + w.bc)
    hf = _lstm_pass(x, w.fw, reverse=False)
    hb = _lstm_pass(x, w.bw, reverse=True)
    return np.concatenate([hf, hb], axis=1)


def tag_logits(h: np.ndarray) -> np.ndarray:
    w = weights()
    return h @ w.Wtag + w.btag


def decode_bioes(tags: np.ndarray) -> list[tuple[int, int, str]]:
    """Greedy BIOES decode with deterministic validity repair
    (SURVEY.md §2.2 X6): S→singleton; B consumes same-type I run, closed by
    same-type E; truncated/lone I/E repaired to what was consumed.
    Returns (start, end_exclusive, label) spans in position order.
    """

    def part(t: int) -> tuple[str, str]:
        if t == TAG_O:
            return "O", ""
        name = TAGS[t]
        return name[0], name[2:]

    spans: list[tuple[int, int, str]] = []
    T = len(tags)
    i = 0
    while i < T:
        p, lab = part(int(tags[i]))
        if p == "O":
            i += 1
        elif p == "S":
            spans.append((i, i + 1, lab))
            i += 1
        elif p == "B":
            j = i + 1
            while j < T and part(int(tags[j])) == ("I", lab):
                j += 1
            if j < T and part(int(tags[j])) == ("E", lab):
                spans.append((i, j + 1, lab))
                i = j + 1
            else:  # repair: truncated span covers B + consumed I run
                spans.append((i, j, lab))
                i = j
        else:  # lone I or E: repair to singleton
            spans.append((i, i + 1, lab))
            i += 1
    return spans


def ner_spans(h: np.ndarray) -> list[tuple[int, int, str, float]]:
    """(start, end, label, score) mentions; score = mean chosen-tag logit
    over span tokens (rounded to 6 dp for cross-engine stability)."""
    logits = tag_logits(h)
    tags = np.argmax(logits, axis=1)
    out = []
    for s, e, lab in decode_bioes(tags)[:MAX_MENTIONS]:
        sc = float(np.mean(logits[np.arange(s, e), tags[s:e]]))
        out.append((s, e, lab, round(sc, 6)))
    return out


#: per-class firing thresholds over the CENTERED biaffine score,
#: calibrated ONCE on the sf0.001 fixture corpus so every relation class
#: fires on its own score tail (~700 pairs/class there, ~3.4/sentence);
#: without per-class calibration the widest-tailed class wins every
#: argmax near any single global threshold
REL_TAU = np.array([0.1301, 0.2988, 0.2024, 0.1490, 0.3162])


def rel_pairs(
    h: np.ndarray, spans: list[tuple[int, int, str, float]]
) -> list[tuple[int, int, str, float]]:
    """Biaffine ordered-pair scorer (SURVEY.md §2.2 X7):
    score_r(i,j) = s_i^T W_r s_j + u_r·[s_i;s_j] over span-averaged
    states, CENTERED per class by its value at the sentence-mean span
    vector (span vectors share a large common mode from the global
    context mixing — the pair-specific deviation is the signal). A pair
    fires iff the argmax class's centered score clears its calibrated
    REL_TAU; confidence = sigmoid of the margin. Emits
    (head_mention_idx, tail_mention_idx, rel_label, prob).
    """
    M = len(spans)
    if M < 2:
        return []
    w = weights()
    S = np.stack([h[s:e].mean(axis=0) for s, e, _, _ in spans])  # (M, 2H)
    nrel = len(REL_LABELS)
    scores = np.zeros((nrel, M, M))
    sbar = S.mean(axis=0)
    for r in range(nrel):
        scores[r] = S @ w.Wbil[r] @ S.T
        # u_r·[s_i; s_j] decomposes into head part (rows) + tail part (cols)
        scores[r] += (S @ w.Wlin[r, :NDIRS_H])[:, None]
        scores[r] += (S @ w.Wlin[r, NDIRS_H:])[None, :]
        scores[r] -= (sbar @ w.Wbil[r] @ sbar
                      + sbar @ w.Wlin[r, :NDIRS_H] + sbar @ w.Wlin[r, NDIRS_H:])
    # vectorized per-pair class argmax (lowest-index tie-break), then the
    # margin gate; python loop only over firing pairs
    r_star = np.argmax(scores, axis=0)  # (M, M)
    best = np.take_along_axis(scores, r_star[None], axis=0)[0]
    margin = best - REL_TAU[r_star]
    out = []
    for i, j in zip(*np.nonzero(margin > 0)):
        if i == j:
            continue
        r = int(r_star[i, j])
        prob = float(1.0 / (1.0 + np.exp(-margin[i, j])))
        out.append((int(i), int(j), REL_LABELS[r], round(prob, 6)))
    return out


def extract_sentence(tokens: list[str]) -> tuple[list, list]:
    """Full per-sentence inference: tokens → (mentions, relations).

    mentions: [(start, end, label, score)], relations:
    [(head_idx, tail_idx, rel_label, prob)]. This is the unit both the
    Spark mapInPandas stage and the single-process oracle call.
    """
    from .text import token_ids

    ids = token_ids(tokens)
    if not ids:
        return [], []
    h = encode(ids)
    spans = ner_spans(h)
    rels = rel_pairs(h, spans)
    return spans, rels
