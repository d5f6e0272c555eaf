"""T0 unit tests: extractor edge cases, tokenizer, BIOES repair, hashing."""

from joint_entity_and_relation_extraction_spark.functions import text as T
from joint_entity_and_relation_extraction_spark.functions import model as M


def test_entities_unescaped():
    html = b"<html><body><p>caf&#233; &amp; bar&nbsp;baz</p></body></html>"
    assert T.html_to_text(html) == "café & bar baz"


def test_script_style_head_stripped():
    html = (b"<html><head><title>T</title><style>p{}</style>"
            b"<script>var x='</p>';</script></head>"
            b"<body><script>noise()</script><p>keep me</p>"
            b"<noscript>no</noscript></body></html>")
    out = T.html_to_text(html)
    assert "keep me" in out
    assert "noise" not in out and "var x" not in out
    assert "T" not in out.split("\n")  # head subtree dropped
    assert "no" not in out.split("\n")


def test_block_vs_inline():
    html = b"<body><p>one <b>two</b> three</p><p>four</p></body>"
    assert T.html_to_text(html) == "one two three\nfour"


def test_latin1_sniffed():
    html_s = ('<html><head><meta charset="latin-1"></head>'
              "<body><p>façade</p></body></html>")
    assert T.html_to_text(html_s.encode("latin-1")) == "façade"


def test_malformed_unclosed():
    html = b"<body><div><b>bold <p>para never closed<div class=x attr>end"
    out = T.html_to_text(html)
    assert "bold" in out and "para never closed" in out and "end" in out


def test_attr_with_gt():
    html = b'<body><p data-x="a > b">content</p></body>'
    assert T.html_to_text(html) == "content"


def test_extraction_deterministic():
    html = b"<body><p>x</p>" + b"<div>y</div>" * 50
    assert T.html_to_text(html) == T.html_to_text(html)


def test_sentences_split_and_chunk():
    txt = "First sentence. Second one! Dr. Smith stayed whole. Mr. A too."
    s = T.sentences(txt)
    joined = [" ".join(x["tokens"]) for x in s]
    assert joined[0] == "First sentence ."
    assert any("Dr . Smith stayed whole" in j for j in joined)
    # chunking: a 200-token line becomes ceil(200/64) sentences
    long = " ".join(f"w{i}" for i in range(200))
    chunks = T.sentences(long)
    assert len(chunks) == 4
    assert all(len(c["tokens"]) <= T.SENT_MAX_TOKENS for c in chunks)
    # char offsets round-trip
    for c in chunks:
        assert long[c["char_start"]:c["char_end"]].split() == c["tokens"]


def test_tokenize():
    assert T.tokenize("a-b c.d!") == ["a", "-", "b", "c", ".", "d", "!"]


def test_fnv_and_ids_stable():
    assert T.fnv1a32("hello") == 0x4F9F2CAB
    assert 0 <= T.token_ids(["Hello"])[0] < T.VOCAB_SIZE
    assert T.token_ids(["Hello"]) == T.token_ids(["hello"])
    assert T.stable_id63("x") == T.stable_id63("x") >= 0


def test_normalize_surface():
    assert T.normalize_surface("  Héllo,  World!! ") == "héllo world"


def test_bioes_decode_repair():
    tag = {name: i for i, name in enumerate(M.TAGS)}
    seq = [tag["B-ORG"], tag["I-ORG"], tag["E-ORG"], tag["O"], tag["S-LOC"]]
    assert M.decode_bioes(seq) == [(0, 3, "ORG"), (4, 5, "LOC")]
    # truncated B-I run (no closing E): repaired to consumed run
    seq = [tag["B-PEOP"], tag["I-PEOP"], tag["O"]]
    assert M.decode_bioes(seq) == [(0, 2, "PEOP")]
    # lone I / E become singletons; type switch breaks the run
    seq = [tag["I-LOC"], tag["E-ORG"], tag["B-ORG"], tag["I-LOC"]]
    assert M.decode_bioes(seq) == [(0, 1, "LOC"), (1, 2, "ORG"),
                                   (2, 3, "ORG"), (3, 4, "LOC")]


def test_model_deterministic_and_shapes():
    toks = "Alice works for Acme Corp in Paris".split()
    s1 = M.extract_sentence(toks)
    s2 = M.extract_sentence(toks)
    assert s1 == s2
    spans, rels = s1
    for st, en, lab, sc in spans:
        assert 0 <= st < en <= len(toks) and lab in M.ENT_LABELS
    for h, t, p, sc in rels:
        assert h != t and p in M.REL_LABELS and 0 < sc <= 1


def test_extract_batch_invariant_to_batching():
    """Pins the fixed-shape determinism contract (functions/model.py module
    docstring): a sentence's (mentions, relations) must be bitwise identical
    no matter how sentences are grouped into batches, which row slot they
    occupy, or which other sentences share the chunk. This is what makes the
    Spark mapInPandas stage reproduce the single-process oracle under any
    partitioning / Arrow batch size (T2)."""
    import numpy as np

    rng = np.random.default_rng(7)
    words = ("alice bob acme corp london paris works lives killed the of and"
             " in quick brown fox jumps over lazy dog").split()
    sents = [
        [words[int(rng.integers(0, len(words)))]
         for _ in range(int(rng.integers(1, 64)))]
        for _ in range(150)
    ]
    sents.append([])  # empty sentence stays ([], [])
    ref = M.extract_batch(sents)
    assert ref[-1] == ([], [])
    # odd chunk sizes straddling LEN/REL bucket chunk boundaries
    chunked = []
    i = 0
    for sz in (1, 2, 5, 17, 40, 86):
        chunked.extend(M.extract_batch(sents[i:i + sz]))
        i += sz
    assert chunked == ref
    # row-slot / companion independence
    perm = list(rng.permutation(len(sents)))
    shuf = M.extract_batch([sents[p] for p in perm])
    assert [shuf[perm.index(k)] for k in range(len(sents))] == ref
    # batch-of-1 (the oracle unit) equals the batched path
    assert [M.extract_sentence(s) for s in sents[:10]] == ref[:10]


def test_extract_batch_truncates_overlong_sentences():
    """Direct kernel callers may pass sentences longer than the largest
    length bucket (split_sentences caps at SENT_MAX_TOKENS, but that is a
    cross-module coupling): extract_batch must truncate to LEN_BUCKETS[-1]
    and equal the explicitly-truncated call, not crash the fixed-shape
    chunk fill (ADVICE r02)."""
    toks = ("alice works for acme corp in paris and lives in london "
            * 12).split()  # 132 tokens > LEN_BUCKETS[-1] == 64
    assert len(toks) > M.LEN_BUCKETS[-1]
    got = M.extract_batch([toks])
    want = M.extract_batch([toks[: M.LEN_BUCKETS[-1]]])
    assert got == want
