"""Deterministic HTML→text extraction, sentence split, tokenization.

Re-expresses the reference's corpus-preprocessing stage (the reference
consumes pre-tokenized CoNLL04/ADE sentence records — SURVEY.md §1.1 R1/R2,
[PK-H]) for raw Common-Crawl-style web pages (BASELINE.json input_hint).

Everything here is pure Python stdlib + ``re`` — fully deterministic so the
"byte-identical extracted text per url" invariant (BASELINE.json:15) is
checkable against committed goldens. NO pyspark imports (see package doc).
"""

from __future__ import annotations

import re
import codecs
from html.parser import HTMLParser

# --- charset sniffing -------------------------------------------------------

_CHARSET_RE = re.compile(rb"""charset\s*=\s*["']?([A-Za-z0-9_.:\-]+)""", re.I)


def sniff_charset(data: bytes) -> str:
    """Sniff encoding from a <meta charset=...> (or http-equiv) declaration in
    the first 4096 bytes; fall back to utf-8. Unknown names fall back too."""
    m = _CHARSET_RE.search(data[:4096])
    if m:
        name = m.group(1).decode("ascii", "replace")
        try:
            return codecs.lookup(name).name
        except LookupError:
            pass
    return "utf-8"


# --- HTML → text ------------------------------------------------------------

# content of these elements is dropped entirely
_SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "head"})

# these element boundaries emit a newline (block-level separation)
_BLOCK_TAGS = frozenset(
    {
        "html", "body", "div", "p", "br", "hr", "li", "ul", "ol", "dl", "dt",
        "dd", "h1", "h2", "h3", "h4", "h5", "h6", "table", "thead", "tbody",
        "tr", "td", "th", "pre", "blockquote", "section", "article", "header",
        "footer", "nav", "aside", "figure", "figcaption", "form", "title",
        "option", "select", "main",
    }
)

_VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)


class _TextExtractor(HTMLParser):
    """Collects visible text; skip-subtrees; newline on block boundaries.

    convert_charrefs=True (default) unescapes &amp; / &#233; / &nbsp; etc.
    Malformed/unclosed tags are handled by HTMLParser's forgiving scanner;
    the skip counter is floored at zero so stray </script> can't corrupt.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._parts: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS and tag not in _VOID_TAGS:
            self._skip += 1
        if tag in _BLOCK_TAGS:
            self._parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and tag not in _VOID_TAGS:
            self._skip = max(0, self._skip - 1)
        if tag in _BLOCK_TAGS:
            self._parts.append("\n")

    def handle_data(self, data: str) -> None:
        if self._skip == 0 and data:
            self._parts.append(data)

    def text(self) -> str:
        return "".join(self._parts)


# horizontal whitespace incl. NBSP (from &nbsp;) — collapsed to one space
_HSPACE_RE = re.compile(r"[ \t\f\v ]+")


def html_to_text(data: bytes) -> str:
    """Deterministic extraction: sniff charset → decode(errors=replace) →
    drop script/style/noscript/template/head subtrees → block tags emit
    newlines → collapse horizontal whitespace → strip each line → drop
    empty lines → join with single newlines.

    The output of this exact function, run single-process by
    oracle/pipeline_local.py, is committed to goldens/extraction.jsonl and
    defines the byte-identity reference (SURVEY.md §5.3).
    """
    enc = sniff_charset(data)
    try:
        raw = data.decode(enc, errors="replace")
    except (LookupError, ValueError):
        raw = data.decode("utf-8", errors="replace")
    parser = _TextExtractor()
    try:
        parser.feed(raw)
        parser.close()
    except Exception:
        # HTMLParser is non-raising for normal malformed input; belt+braces
        pass
    txt = parser.text().replace("\r\n", "\n").replace("\r", "\n")
    lines = []
    for ln in txt.split("\n"):
        ln = _HSPACE_RE.sub(" ", ln).strip()
        if ln:
            lines.append(ln)
    return "\n".join(lines)


# --- sentence segmentation --------------------------------------------------

# the reference corpora are pre-sentence-split [PK-H]; web text needs this.
_ABBREV = frozenset(
    {"mr.", "mrs.", "ms.", "dr.", "prof.", "st.", "jr.", "sr.", "vs.",
     "e.g.", "i.e.", "etc.", "inc.", "ltd.", "co.", "corp.", "no.", "fig.",
     "al.", "approx.", "dept.", "est.", "jan.", "feb.", "mar.", "apr.",
     "jun.", "jul.", "aug.", "sep.", "sept.", "oct.", "nov.", "dec."}
)

_SENT_BOUND_RE = re.compile(r"(?<=[.!?])[\s]+(?=[A-Z0-9À-ɏ])")
_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)

#: hard cap so the relation head's O(T^2)-ish work stays bounded per sentence
SENT_MAX_TOKENS = 64


def _split_line(line: str, base: int) -> list[tuple[int, int]]:
    """Sentence (start, end) char spans within one newline-free line, with
    an abbreviation guard; offsets are absolute (line offset ``base``)."""
    spans: list[tuple[int, int]] = []
    start = 0
    for m in _SENT_BOUND_RE.finditer(line):
        cut = m.start()
        # guard: last token before the boundary is a known abbreviation
        prev = line[start:cut].rsplit(None, 1)
        last = prev[-1].lower() if prev else ""
        if last in _ABBREV:
            continue
        spans.append((base + start, base + cut))
        start = m.end()
    if start < len(line):
        spans.append((base + start, base + len(line)))
    return spans


def tokenize(text: str) -> list[str]:
    """Unicode word chars + single punctuation marks (stand-in for the
    reference's BERT WordPiece tokenizer, which needs a vocab file that is
    unavailable offline — SURVEY.md §2.2 X4)."""
    return _TOKEN_RE.findall(text)


def sentences(text: str) -> list[dict]:
    """Deterministic segmentation of extracted text into token chunks.

    Newlines are hard boundaries; within a line, [.!?]+whitespace+upper
    splits (abbreviation-guarded); sentences longer than SENT_MAX_TOKENS
    are chunked on token boundaries. Returns
    ``[{"sent_id", "char_start", "char_end", "tokens"}]``.
    """
    out: list[dict] = []
    pos = 0
    for line in text.split("\n"):
        for s, e in _split_line(line, pos):
            seg = text[s:e]
            toks = [(m.group(0), m.start(), m.end()) for m in _TOKEN_RE.finditer(seg)]
            if not toks:
                continue
            for i in range(0, len(toks), SENT_MAX_TOKENS):
                chunk = toks[i : i + SENT_MAX_TOKENS]
                out.append(
                    {
                        "sent_id": len(out),
                        "char_start": s + chunk[0][1],
                        "char_end": s + chunk[-1][2],
                        "tokens": [t[0] for t in chunk],
                    }
                )
        pos += len(line) + 1
    return out


# --- hashing / ids ----------------------------------------------------------

VOCAB_SIZE = 20011  # prime; hashed stand-in for the WordPiece vocab

_FNV32_OFFSET, _FNV32_PRIME = 0x811C9DC5, 0x01000193
_FNV64_OFFSET, _FNV64_PRIME = 0xCBF29CE484222325, 0x100000001B3


def fnv1a32(s: str) -> int:
    h = _FNV32_OFFSET
    for b in s.encode("utf-8"):
        h = ((h ^ b) * _FNV32_PRIME) & 0xFFFFFFFF
    return h


def fnv1a64(s: str) -> int:
    h = _FNV64_OFFSET
    for b in s.encode("utf-8"):
        h = ((h ^ b) * _FNV64_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h


def stable_id63(s: str) -> int:
    """Deterministic 63-bit non-negative id (fits Spark LongType). Used for
    unlinked-mention node ids — never monotonically_increasing_id in graded
    outputs (SURVEY.md §4.3)."""
    return fnv1a64(s) & 0x7FFFFFFFFFFFFFFF


def token_ids(tokens: list[str]) -> list[int]:
    return [fnv1a32(t.lower()) % VOCAB_SIZE for t in tokens]


def normalize_surface(s: str) -> str:
    """NFKC + casefold + strip punctuation/extra whitespace — mention/alias
    normalization for entity linking (SURVEY.md §2.3 L1)."""
    import unicodedata

    s = unicodedata.normalize("NFKC", s).casefold()
    s = re.sub(r"[^\w\s]+", " ", s, flags=re.UNICODE)
    return re.sub(r"\s+", " ", s).strip()
