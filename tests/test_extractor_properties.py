"""Property tests for the extraction kernels (hypothesis): determinism,
robustness on arbitrary bytes, no skip-subtree leakage, whitespace
canonical form, sentence-offset round-trips."""

from hypothesis import given, settings
from hypothesis import strategies as st

from joint_entity_and_relation_extraction_spark.functions import text as T


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_extractor_total_and_deterministic_on_arbitrary_bytes(data):
    out1 = T.html_to_text(data)
    out2 = T.html_to_text(data)
    assert out1 == out2
    assert isinstance(out1, str)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=500))
def test_extractor_canonical_whitespace(payload):
    html = f"<body><p>{payload}</p></body>".encode("utf-8", "replace")
    out = T.html_to_text(html)
    if out == "":
        return
    for line in out.split("\n"):
        assert line == line.strip() and line != ""
        assert "\t" not in line and "  " not in line


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_characters="<>&",
                                      blacklist_categories=("Cs", "Cc")),
               min_size=1, max_size=200))
def test_script_and_style_never_leak(payload):
    html = (f"<body><script>SECRET{payload}</script>"
            f"<style>HIDDEN{payload}</style><p>visible</p></body>"
            ).encode("utf-8", "replace")
    out = T.html_to_text(html)
    assert "SECRET" not in out and "HIDDEN" not in out
    assert "visible" in out


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abc XYZ.!?\n", min_size=1, max_size=300))
def test_sentence_offsets_roundtrip(text):
    for s in T.sentences(text):
        seg = text[s["char_start"]:s["char_end"]]
        assert T.tokenize(seg) == s["tokens"]
        assert 0 < len(s["tokens"]) <= T.SENT_MAX_TOKENS


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=100))
def test_hashing_total(s):
    assert 0 <= T.fnv1a32(s) < 2 ** 32
    assert 0 <= T.stable_id63(s) < 2 ** 63
    assert T.normalize_surface(s) == T.normalize_surface(s)
