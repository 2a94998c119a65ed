"""Fast HTML tokenizer for the block segmenter — one compiled-regex
scan instead of stdlib ``html.parser``'s char-by-char ``goahead`` loop
(measured ~5× on the synthetic page corpus; the stdlib machinery was
95% of the strip kernel's 209 µs/parse profile).

Semantics match :class:`tesseract_glue_spark.web.html_main._BlockParser`
for everything the segmenter state machine observes — tag names
lowercased, self-closing flag, ``href`` attribute (entity-unescaped),
character references decoded in data, script/style contents skipped as
CDATA — and a differential test in ``tests/test_web.py`` asserts
block/link equality against the stdlib implementation on handwritten
and hypothesis-generated markup. EOF recovery on TRUNCATED constructs
(unclosed tag or comment at end of input) is tolerant but may split
data differently from the stdlib parser; neither raises.
"""

from __future__ import annotations

import re
from html import unescape

# One token per scan step: comment | CDATA | doctype/PI | close tag |
# open tag (quoted attrs may contain '>'). Tags REQUIRE '>' — a '<'
# that never closes is emitted as literal data, one char at a time.
_TAG_RE = re.compile(
    r"<!--.*?-->"
    r"|<!\[CDATA\[.*?\]\]>"
    r"|<[!?][^>]*>"
    # whitespace is legal after '</' but NOT between '<' and a tag name
    # (stdlib treats '< b' as text) — keep that asymmetry exactly
    r"|</\s*([a-zA-Z][a-zA-Z0-9:_.-]*)[^>]*>"
    r"|<([a-zA-Z][a-zA-Z0-9:_.-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*?)(/?)\s*>",
    re.DOTALL,
)
_HREF_RE = re.compile(
    r"""href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)
_ATTR_RE = re.compile(
    r"""([a-zA-Z][a-zA-Z0-9:_-]*)\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
)
# tags whose FULL attr list is materialized (metadata carriers); for
# everything else only <a href> is parsed — attr parsing on every tag
# is what makes the stdlib path slow
_ATTR_TAGS = frozenset({"meta", "link", "base", "img", "source"})
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script[^>]*>", re.IGNORECASE | re.DOTALL),
    "style": re.compile(r"</\s*style[^>]*>", re.IGNORECASE | re.DOTALL),
}


def feed_tokens(sink, html: str) -> None:
    """Drive a segmenter-state sink (handle_starttag / handle_endtag /
    handle_startendtag / handle_data) over ``html`` with one regex scan.

    Only the ``href`` attribute is materialized (the segmenter needs
    nothing else) — attr parsing for every tag is what makes the stdlib
    path slow."""
    pos = 0
    n = len(html)
    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            data = html[pos:]
            sink.handle_data(unescape(data) if "&" in data else data)
            break
        if lt > pos:
            data = html[pos:lt]
            sink.handle_data(unescape(data) if "&" in data else data)
        m = _TAG_RE.match(html, lt)
        if m is None:
            sink.handle_data("<")
            pos = lt + 1
            continue
        pos = m.end()
        close, name, attrs, selfclose = m.groups()
        if close is not None:
            sink.handle_endtag(close.lower())
            continue
        if name is None:
            continue  # comment / CDATA / doctype / PI
        tag = name.lower()
        if tag == "a":
            href = _href_attr(attrs)
        elif tag in _ATTR_TAGS:
            href = _all_attrs(attrs)
        else:
            href = _NO_ATTRS
        if selfclose:
            sink.handle_startendtag(tag, href)
            continue
        sink.handle_starttag(tag, href)
        cdata = _CDATA_CLOSE.get(tag)
        if cdata is not None:
            # script/style: raw text until the matching close tag (or
            # EOF); contents are never delivered — the segmenter skips
            # them anyway, so skipping here is both faster and safe
            cm = cdata.search(html, pos)
            if cm is None:
                sink.handle_endtag(tag)
                break
            pos = cm.end()
            sink.handle_endtag(tag)


_NO_ATTRS: list[tuple[str, str]] = []


def _all_attrs(attrs: str | None) -> list[tuple[str, str]]:
    if not attrs:
        return _NO_ATTRS
    out = []
    for m in _ATTR_RE.finditer(attrs):
        raw = m.group(2) or m.group(3) or m.group(4) or ""
        out.append((m.group(1).lower(), unescape(raw) if "&" in raw else raw))
    return out


def _href_attr(attrs: str | None) -> list[tuple[str, str]]:
    if not attrs:
        return _NO_ATTRS
    m = _HREF_RE.search(attrs)
    if m is None:
        return _NO_ATTRS
    raw = next(g for g in m.groups() if g is not None)
    return [("href", unescape(raw) if "&" in raw else raw)]
