"""HTML main-content extraction: text-density / link-density block classifier.

The engine's flagship stateless transform (north star: Readability /
trafilatura-style boilerplate stripping). Reimagines the reference's
line-geometry classifier (`analyze_line_elements`, /root/reference/
dataextractai/parsers/wellsfargo_bank_parser.py:81-126 — classify lines by
whitespace-run widths) and its footer/boilerplate phrase blacklist
(/root/reference/dataextractai/parsers/first_republic_bank_parser.py:393-424)
as an HTML block classifier:

1. segment the document into block-level text runs (stdlib ``html.parser``,
   entity-aware, with exact char-offset spans into the decoded document),
2. score each block: total chars, chars inside ``<a>`` (link density),
3. keep blocks that are long enough, link-sparse, and not boilerplate-phrased;
   everything else is labelled boilerplate (kept in ``spans`` for lineage).

Pure per-document function — no cross-doc state, no wall clock, no locale —
so extraction is byte-identical under any batch order / parallelism
(SURVEY.md §7.4 byte-identity requirement).
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

EXTRACTOR_NAME = "html_density_v1"

MIN_CONTENT_CHARS = 25
MAX_LINK_DENSITY = 0.35
# phrase blacklist applies to short blocks only (a long article that merely
# mentions a phrase is not boilerplate) — reference analog: the First Republic
# footer blacklist trims continuation lines AND drops junk records.
BLACKLIST_MAX_CHARS = 160
BOILERPLATE_PHRASES = (
    "all rights reserved",
    "privacy policy",
    "terms of service",
    "cookie policy",
    "sign in",
    "subscribe",
    "click here",
    "sponsored content",
    "related article",
    "trending now",
    "navigation link",
    "member fdic",  # reference blacklist carry-over
)

_BLOCK_TAGS = frozenset(
    "p div article section main li ul ol dl dd dt h1 h2 h3 h4 h5 h6 "
    "td th tr table thead tbody blockquote pre figure figcaption "
    "nav aside footer header form fieldset hr".split()
)
_SKIP_TAGS = frozenset("script style noscript template svg head title".split())
_WS_RE = re.compile(r"\s+")


class _BlockParser(HTMLParser):
    """Segments decoded HTML into text blocks with char-offset spans."""

    def __init__(self, doc: str):
        super().__init__(convert_charrefs=False)
        self._line_starts = [0]
        for m in re.finditer("\n", doc):
            self._line_starts.append(m.end())
        self.blocks: list[dict] = []  # {text, link_chars, start, end}
        self._pieces: list[str] = []
        self._link_chars = 0
        self._start = -1
        self._end = -1
        self._link_depth = 0
        self._skip_depth = 0

    def _abs(self) -> int:
        line, col = self.getpos()
        return self._line_starts[line - 1] + col

    def _add(self, piece: str, start: int, end: int) -> None:
        if self._skip_depth > 0 or not piece:
            return
        self._pieces.append(piece)
        if self._link_depth > 0:
            self._link_chars += len(piece.strip())
        if self._start < 0:
            self._start = start
        self._end = end

    def _flush(self) -> None:
        if self._pieces:
            text = "".join(self._pieces)
            self.blocks.append(
                {
                    "text": text,
                    "link_chars": self._link_chars,
                    "start": self._start,
                    "end": self._end,
                }
            )
        self._pieces = []
        self._link_chars = 0
        self._start = -1
        self._end = -1

    # -- tag events ---------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._link_depth += 1
        elif tag == "br":
            p = self._abs()
            self._add(" ", p, p)

    def handle_startendtag(self, tag, attrs):
        if tag == "br":
            p = self._abs()
            self._add(" ", p, p)
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._link_depth = max(0, self._link_depth - 1)

    # -- data events --------------------------------------------------------
    def handle_data(self, data):
        s = self._abs()
        self._add(data, s, s + len(data))

    def handle_entityref(self, name):
        s = self._abs()
        self._add(unescape(f"&{name};"), s, s + len(name) + 2)

    def handle_charref(self, name):
        s = self._abs()
        self._add(unescape(f"&#{name};"), s, s + len(name) + 3)

    def close(self):
        super().close()
        self._flush()


def classify_block(norm_text: str, link_chars: int) -> bool:
    """True iff the block is main content (density heuristic + blacklist)."""
    n = len(norm_text)
    if n < MIN_CONTENT_CHARS:
        return False
    stripped_len = len(_WS_RE.sub("", norm_text))
    link_density = link_chars / stripped_len if stripped_len else 1.0
    if link_density > MAX_LINK_DENSITY:
        return False
    if n <= BLACKLIST_MAX_CHARS:
        low = norm_text.lower()
        for phrase in BOILERPLATE_PHRASES:
            if phrase in low:
                return False
    return True


def extract_html(payload: bytes) -> dict:
    """payload bytes → {status, extracted_text, spans, n_blocks, error}.

    ``spans`` are char offsets into the utf-8-decoded document; content
    blocks are joined with ``"\\n"``.
    """
    try:
        doc = payload.decode("utf-8")
    except UnicodeDecodeError as e:
        return {
            "status": "error",
            "extracted_text": "",
            "spans": [],
            "n_blocks": 0,
            "error": f"decode_error: {e.reason}",
        }
    try:
        parser = _BlockParser(doc)
        parser.feed(doc)
        parser.close()
    except Exception as e:  # html.parser is permissive; belt and braces
        return {
            "status": "error",
            "extracted_text": "",
            "spans": [],
            "n_blocks": 0,
            "error": f"parse_error: {type(e).__name__}: {e}",
        }
    spans = []
    content = []
    for b in parser.blocks:
        norm = _WS_RE.sub(" ", b["text"]).strip()
        if not norm:
            continue
        is_content = classify_block(norm, b["link_chars"])
        spans.append(
            {
                "start": b["start"],
                "end": b["end"],
                "kind": "content" if is_content else "boilerplate",
            }
        )
        if is_content:
            content.append(norm)
    text = "\n".join(content)
    if not text:
        return {
            "status": "empty",
            "extracted_text": "",
            "spans": spans,
            "n_blocks": 0,
            "error": "no_content_blocks",
        }
    return {
        "status": "ok",
        "extracted_text": text,
        "spans": spans,
        "n_blocks": len(content),
        "error": None,
    }
