"""Vectorized-prepass HTML block scanner (round 3, VERDICT r2 #7).

The per-token Python loop in ``html_extract._scan_blocks`` (regex finditer,
match objects, per-token head slicing and name parsing) is the extraction
pipeline's single-node ceiling. This module replaces the tokenizer for the
COMMON CASE with numpy passes over the raw byte buffer of the WHOLE BATCH:

1. one pass finds every ``<`` / ``>`` and derives token spans,
2. one batched pass extracts + lowercases tag names into a fixed-width
   matrix and classifies all tags in the batch against the known tag set
   (~44 vectorized uint64 comparisons TOTAL, not per tag),
3. a small per-document Python loop walks the pre-classified EVENTS
   (block/skip/anchor/br tags and text-run gaps) to assemble blocks — no
   regex, no string slicing except the text pieces that land in the output.

Byte-identity discipline: the fast path runs ONLY for documents where byte
offsets equal char offsets and the regex tokenizer's quirk cases cannot
occur — pure-ASCII payloads with no comments, no whitespace after ``<``,
and no ``<`` swallowed inside a tag token. Anything else falls back to the
proven scanner (`_scan_blocks`), and `tests/test_html_fast.py` pins
fast == slow over the corpus, the robustness suite, and the edge-case list.
Output blocks are bit-identical, so the frozen goldens pin the swap.
"""

from __future__ import annotations

from html import unescape

import numpy as np

from .html_extract import _BLOCK_TAGS, _SKIP_TAGS, _scan_blocks

# event classes (int8)
_NOOP, _BLOCK, _SKIP, _ANCHOR, _BR = 0, 1, 2, 3, 4

_WS_BYTES = (9, 10, 13, 32)


def _tag_code(name: str) -> tuple[int, int]:
    b = name.encode()
    if len(b) > 12:  # pragma: no cover — no known tag is that long
        raise ValueError(name)
    w = b + b"\0" * (12 - len(b))
    return int.from_bytes(w[:8], "little"), int.from_bytes(w[8:12], "little")


_MIX_MULT = np.uint64(0x9E3779B97F4A7C15)


def _mix_codes(c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        return c1 * _MIX_MULT ^ c2.astype(np.uint64)


def _build_codes():
    codes: list[tuple[int, int, int]] = []
    for n in _BLOCK_TAGS:
        codes.append((*_tag_code(n), _BLOCK))
    for n in _SKIP_TAGS:
        codes.append((*_tag_code(n), _SKIP))
    codes.append((*_tag_code("a"), _ANCHOR))
    codes.append((*_tag_code("br"), _BR))
    k1 = np.array([c[0] for c in codes], dtype=np.uint64)
    k2 = np.array([c[1] for c in codes], dtype=np.uint32)
    kc = np.array([c[2] for c in codes], dtype=np.int8)
    # one searchsorted over mixed codes replaces 44 per-tag comparisons; a
    # hash collision is ruled out by the exact (c1, c2) verify at lookup
    mix = _mix_codes(k1, k2)
    order = np.argsort(mix)
    return k1[order], k2[order], kc[order], mix[order]


_K1, _K2, _KC, _KMIX = _build_codes()


def _classify_codes(c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    """Vectorized name-code → event-class lookup (searchsorted + exact
    verify), amortized over every tag in the batch."""
    mix = _mix_codes(c1, c2)
    idx = np.searchsorted(_KMIX, mix)
    idx = np.minimum(idx, _KMIX.size - 1)
    hit = (_K1[idx] == c1) & (_K2[idx] == c2)
    cls = np.zeros(c1.size, dtype=np.int8)
    cls[hit] = _KC[idx[hit]]
    return cls


def scan_blocks_batch(payloads: list[bytes]) -> list:
    """Per-doc block lists (same dicts as ``_scan_blocks``) for fast-path
    eligible documents; ``None`` marks a document that must use the slow
    scanner. One numpy pass over the concatenated batch buffer."""
    n_docs = len(payloads)
    results: list = [None] * n_docs
    if n_docs == 0:
        return results
    sizes = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n_docs)
    doc_start = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(sizes, out=doc_start[1:])
    arr = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    total = arr.size

    bad = np.zeros(n_docs, dtype=bool)
    if total:
        hi = np.flatnonzero(arr >= 128)  # non-ASCII → byte offset ≠ char offset
        if hi.size:
            bad[np.unique(np.searchsorted(doc_start, hi, side="right") - 1)] = True

    lt = np.flatnonzero(arr == 60)  # '<'
    gt = np.flatnonzero(arr == 62)  # '>'
    if lt.size:
        lt_doc = np.searchsorted(doc_start, lt, side="right") - 1
        doc_end = doc_start[lt_doc + 1]
        gi = np.searchsorted(gt, lt)
        has_gt = gi < gt.size
        tag_close = np.where(has_gt, gt[np.minimum(gi, max(gt.size - 1, 0))], np.int64(1 << 62))
        terminated = tag_close < doc_end  # else: unterminated token runs to doc EOF
        tag_end = np.where(terminated, tag_close + 1, doc_end)

        # eligibility per doc ------------------------------------------------
        # a '<' swallowed inside the previous tag token breaks "every '<'
        # starts a token"
        same_doc = lt_doc[1:] == lt_doc[:-1]
        swallowed = same_doc & (tag_end[:-1] > lt[1:])
        if swallowed.any():
            bad[np.unique(lt_doc[:-1][swallowed])] = True

        def _byte_at(off: int):
            p = lt + off
            in_doc = p < doc_end
            return np.where(in_doc, arr[np.minimum(p, total - 1)], 0), in_doc

        b1, in1 = _byte_at(1)
        b2, in2 = _byte_at(2)
        b3, _ = _byte_at(3)
        is_comment = (b1 == 33) & (b2 == 45) & (b3 == 45)  # '<!--' ends at '-->'
        is_ws1 = np.isin(b1, _WS_BYTES) & in1  # '< div' — regex still names it
        is_slash = (b1 == 47) & in1
        is_ws2 = is_slash & np.isin(b2, _WS_BYTES) & in2  # '</ div'
        quirky = is_comment | is_ws1 | is_ws2
        if quirky.any():
            bad[np.unique(lt_doc[quirky])] = True

        # batched tag-name classification ------------------------------------
        name_start = lt + 1 + is_slash.astype(np.int64)
        colpos = name_start[:, None] + np.arange(12)
        W = arr[np.minimum(colpos, max(total - 1, 0))]
        W = np.where((W >= 65) & (W <= 90), W + 32, W)  # ASCII lowercase
        limit = np.where(terminated, tag_close, doc_end)
        valid = colpos < limit[:, None]
        is_name = (
            (((W >= 97) & (W <= 122)) | ((W >= 48) & (W <= 57)) | (W == 58) | (W == 45))
            & valid
        )
        all12 = is_name.all(axis=1)
        name_len = np.where(all12, 12, (~is_name).argmax(axis=1))
        Wz = np.where(np.arange(12)[None, :] < name_len[:, None], W, 0).astype(np.uint8)
        c1 = np.ascontiguousarray(Wz[:, :8]).view(np.uint64).ravel()
        c2 = np.ascontiguousarray(Wz[:, 8:12]).view(np.uint32).ravel()
        cls = _classify_codes(c1, c2)
        first_alpha = (Wz[:, 0] >= 97) & (Wz[:, 0] <= 122)
        cls[~first_alpha | ~terminated] = _NOOP  # '<123>', '<!...>', '<' at EOF
        # '<script/>' must NOT enter raw-content mode (same check the slow
        # scanner does with doc.startswith("/>", end-2))
        self_close = terminated & (arr[np.maximum(tag_close - 1, 0)] == 47)
        cls[(cls == _SKIP) & ~is_slash & self_close] = _NOOP

        pos_l = lt.tolist()
        end_l = tag_end.tolist()
        cls_l = cls.tolist()
        closing_l = is_slash.tolist()
        c1_l = c1.tolist()
        tag_lo = np.searchsorted(lt, doc_start[:-1]).tolist()
        tag_hi = np.searchsorted(lt, doc_start[1:]).tolist()
    else:
        pos_l = end_l = cls_l = closing_l = c1_l = []
        tag_lo = [0] * n_docs
        tag_hi = [0] * n_docs

    starts = doc_start.tolist()
    for d in range(n_docs):
        if bad[d]:
            continue
        doc = payloads[d].decode("ascii")  # eligible ⇒ pure ASCII
        results[d] = _assemble_blocks(
            doc, starts[d], starts[d + 1], tag_lo[d], tag_hi[d],
            pos_l, end_l, cls_l, closing_l, c1_l,
        )
    return results


def _assemble_blocks(
    doc: str, lo: int, hi: int, ti: int, tj: int,
    pos, end, cls, closing, c1,
) -> list[dict]:
    """Walk one document's pre-classified events; mirrors ``_scan_blocks``'s
    flush/anchor/skip state machine exactly (pinned by the differential
    test), with offsets relative to the document."""
    blocks: list[dict] = []
    pieces: list[str] = []
    link_chars = 0
    b_start = -1
    b_end = -1
    anchor_stack: list[int] = []  # ABSOLUTE open positions
    anchor_pairs: dict[int, int] | None = None

    def flush(p_abs: int):
        nonlocal pieces, link_chars, b_start, b_end, anchor_stack, anchor_pairs
        if pieces:
            blocks.append(
                {
                    "text": "".join(pieces),
                    "link_chars": link_chars,
                    "start": b_start,
                    "end": b_end,
                }
            )
        pieces = []
        link_chars = 0
        b_start = -1
        b_end = -1
        if anchor_stack:
            if anchor_pairs is None:
                anchor_pairs = _anchor_pairs_events(pos, cls, closing, c1, ti, tj)
            anchor_stack = [p for p in anchor_stack if anchor_pairs.get(p, -1) > p_abs]

    def add(piece: str, start_abs: int, end_abs: int):
        nonlocal link_chars, b_start, b_end
        if not piece:
            return
        pieces.append(piece)
        if anchor_stack:
            link_chars += len(piece.strip())
        if b_start < 0:
            b_start = start_abs - lo
        b_end = end_abs - lo

    cursor = lo
    i = ti
    while i < tj:
        p = pos[i]
        if p > cursor:  # text run gap [cursor, p)
            tok = doc[cursor - lo : p - lo]
            add(unescape(tok) if "&" in tok else tok, cursor, p)
        cursor = end[i]
        c = cls[i]
        if c == _BLOCK:
            flush(p)
        elif c == _ANCHOR:
            if closing[i]:
                if anchor_stack:
                    anchor_stack.pop()
            else:
                anchor_stack.append(p)
        elif c == _BR:
            add(" ", p, p)  # the scanner does NOT check closing for <br>/<\/br>
        elif c == _SKIP and not closing[i]:
            # raw-content mode: jump to the matching close tag (everything
            # between — text, other tags, other skip opens — is inert)
            name = c1[i]
            j = i + 1
            while j < tj and not (cls[j] == _SKIP and closing[j] and c1[j] == name):
                j += 1
            if j < tj:
                cursor = end[j]
                i = j
            else:
                cursor = hi
                i = tj
                break
        i += 1
    if cursor < hi:
        tok = doc[cursor - lo :]
        add(unescape(tok) if "&" in tok else tok, cursor, hi)
    flush(hi)
    return blocks


def _anchor_pairs_events(pos, cls, closing, c1, ti, tj) -> dict[int, int]:
    """Stack pairing of ``<a>``/``</a>`` events, eliding skip-region
    contents with the SAME same-name jump rule as the assembler — the
    event-array form of ``_anchor_close_positions`` (identical tokenization
    by construction, so pairing can never disagree with scanner state)."""
    pairs: dict[int, int] = {}
    stack: list[int] = []
    i = ti
    while i < tj:
        c = cls[i]
        if c == _SKIP and not closing[i]:
            name = c1[i]
            j = i + 1
            while j < tj and not (cls[j] == _SKIP and closing[j] and c1[j] == name):
                j += 1
            if j >= tj:
                break  # raw mode to EOF — no more anchor events
            i = j
        elif c == _ANCHOR:
            if closing[i]:
                if stack:
                    pairs[stack.pop()] = pos[i]
            else:
                stack.append(pos[i])
        i += 1
    return pairs
