"""Deterministic web_pages fixture synthesis (FIXTURES.md §2).

Turns driver-provided ``documents`` rows into Common-Crawl-style pages with
the BASELINE.json input_hint schema
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
Seedless & pure: every field is a function of (doc_id, text, lang, source),
so the Spark path and the pandas oracle generate identical bytes. 8 rotating
HTML templates (doc_id % 8) cover the extractor edge cases. NO pyspark
imports (shared with the oracle).
"""

from __future__ import annotations

import datetime as _dt

EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)


def make_url(source: str, doc_id: int) -> str:
    return f"https://{source}.example.com/doc/{doc_id}"


def make_warc_ts(doc_id: int) -> _dt.datetime:
    return EPOCH + _dt.timedelta(seconds=37 * int(doc_id))


def effective_source(source: str, doc_id: int, skew: bool) -> str:
    """Hot-domain knob: with skew on, 30% of rows land on src0
    (doc_id % 10 < 3) — deterministic input for salting/AQE-skew tests."""
    if skew and int(doc_id) % 10 < 3:
        return "src0"
    return source


def _paragraphs(text: str, per: int = 12) -> list[str]:
    words = text.split()
    return [" ".join(words[i : i + per]) for i in range(0, len(words), per)] or [""]


def make_html(doc_id: int, text: str, lang: str) -> bytes:
    """Template index = doc_id % 8 (stable mix, FIXTURES.md §2)."""
    t = int(doc_id) % 8
    title = f"Document {doc_id}"
    paras = _paragraphs(text)

    if t == 0:  # plain
        body = "\n".join(f"<p>{p}</p>" for p in paras)
        html = (f"<html><head><title>{title}</title></head>"
                f"<body><h1>{title}</h1>\n{body}</body></html>")
    elif t == 1:  # nested divs
        body = "\n".join(f"<div class=\"outer\"><div><div><p>{p}</p></div></div></div>"
                         for p in paras)
        html = (f"<html><head><title>{title}</title></head>"
                f"<body><div id=\"main\">{body}</div></body></html>")
    elif t == 2:  # inline tags mid-sentence
        parts = []
        for i, p in enumerate(paras):
            w = p.split()
            if len(w) > 3:
                w[1] = f"<b>{w[1]}</b>"
                w[3] = f"<a href=\"/doc/{doc_id}/{i}\">{w[3]}</a>"
            parts.append("<p>" + " ".join(w) + "</p>")
        html = (f"<html><head><title>{title}</title></head><body>"
                + "\n".join(parts) + "</body></html>")
    elif t == 3:  # script + style blocks that MUST be stripped
        body = "\n".join(f"<p>{p}</p>" for p in paras)
        html = (f"<html><head><title>{title}</title>"
                f"<style>p {{ color: red; }} .x>{{}}</style>"
                f"<script>var x = 1 < 2 && \"</p>\";</script></head>"
                f"<body><script>document.write('NOISE{doc_id}');</script>"
                f"{body}<noscript>enable js</noscript></body></html>")
    elif t == 4:  # HTML entities
        body = "\n".join(f"<p>{p} &amp; caf&#233;&nbsp;r&eacute;sum&#233;</p>"
                         for p in paras)
        html = (f"<html><head><title>{title}</title></head><body>{body}"
                f"</body></html>")
    elif t == 5:  # attributes with '>' inside quoted values
        body = "\n".join(
            f"<p data-expr=\"a > b\" title=\"x>y>{i}\">{p}</p>"
            for i, p in enumerate(paras))
        html = (f"<html><head><title>{title}</title></head>"
                f"<body><div data-arrow=\"=>\">{body}</div></body></html>")
    elif t == 6:  # latin-1 declared AND encoded page
        body = "\n".join(f"<p>{p}</p>" for p in paras)
        html_s = (f"<html><head><meta charset=\"latin-1\"><title>{title}"
                  f"</title></head><body>{body}<p>façade naïve</p>"
                  f"</body></html>")
        return html_s.encode("latin-1", errors="replace")
    else:  # 7: malformed / unclosed tags
        body = "\n".join(f"<p>{p}" for p in paras)  # never closed
        html = (f"<html><head><title>{title}</head>"
                f"<body><div><b>{body}<p>tail without close"
                f"<div class=unquoted attr>end</body>")
    return html.encode("utf-8")


def web_page_row(doc_id: int, text: str, lang: str, source: str,
                 skew: bool = False) -> dict:
    src = effective_source(source, doc_id, skew)
    return {
        "url": make_url(src, doc_id),
        "warc_ts": make_warc_ts(doc_id),
        "html": make_html(doc_id, text, lang),
        "text": None,  # populated by the extractor stage
        "lang": lang,
    }
