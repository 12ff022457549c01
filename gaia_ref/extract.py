"""T1 — deterministic HTML→text extraction + segmentation (the oracle).

Analog of the reference's rsd→ltf conversion: raw bytes → clean text →
sentences + token offsets (/root/reference/README.md:44 names the
ltf+rsd dual representation that every downstream stage consumes).

The output of :func:`extract_text` is the *byte-identical* target the
Spark pandas-UDF (gaia_spark/operators/extract.py) must reproduce per
url (BASELINE.json:15).  Every rule is pinned below; do not change any
rule without regenerating golden fixtures:

  1.  bytes → str via UTF-8, errors='replace'
  2.  strip ``<!-- … -->`` comments (unterminated comment runs to EOF)
  3.  strip ``<script>``/``<style>`` elements incl. content
      (case-insensitive, attrs allowed; unterminated runs to EOF)
  4.  block-level tags (open or close) → '\n'; every other tag → ' '
  5.  decode entities from a pinned table + numeric ``&#…;``/``&#x…;``
      (invalid or unknown entities stay literal)
  6.  CRLF/CR → LF; NBSP and other exotic horizontal space → ' '
  7.  per line: collapse horizontal whitespace runs to one space, strip
  8.  drop empty lines, join with '\n'
  9.  NFC normalize; result has no trailing whitespace

Sentence segmentation (:func:`split_sentences`) and whitespace
tokenization (:func:`tokenize`) are defined over the extracted text so
char offsets are stable — the property that makes mention provenance
offsets (ltf-style) survive distribution.
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

__all__ = ["extract_text", "split_sentences", "tokenize",
           "tokenize_span", "norm_surface"]

# Tags whose boundary implies a line break in the extracted text.
_BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li tr td th table ul ol dl dt dd br hr
    title header footer nav section article aside blockquote pre main
    figure figcaption form fieldset address""".split()
)

# Pinned entity table (unknown names stay literal — '&foo;' survives).
_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "ndash": "–", "mdash": "—",
    "hellip": "…", "copy": "©", "reg": "®",
    "trade": "™", "deg": "°", "laquo": "«",
    "raquo": "»", "lsquo": "‘", "rsquo": "’",
    "ldquo": "“", "rdquo": "”", "middot": "·",
    "sect": "§", "para": "¶", "plusmn": "±",
    "times": "×", "divide": "÷", "euro": "€",
    "pound": "£", "yen": "¥", "cent": "¢",
    "eacute": "é", "egrave": "è", "agrave": "à",
    "uuml": "ü", "ouml": "ö", "auml": "ä",
    "szlig": "ß", "ntilde": "ñ", "ccedil": "ç",
}

_COMMENT_RE = re.compile(r"<!--.*?(?:-->|\Z)", re.DOTALL)
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?(?:</\1\s*>|\Z)", re.DOTALL | re.IGNORECASE
)
_TAG_RE = re.compile(r"</?([a-zA-Z][a-zA-Z0-9]*)\b[^>]*?/?>")
_DOCTYPE_RE = re.compile(r"<![^>]*>")
_ENTITY_RE = re.compile(r"&(#[0-9]+|#[xX][0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);")
# Horizontal whitespace incl. NBSP and unicode spaces; excludes \n.
_HSPACE_RE = re.compile(r"[^\S\n]+")


def _decode_entity(m: re.Match) -> str:
    body = m.group(1)
    if body.startswith("#"):
        try:
            cp = int(body[2:], 16) if body[1] in "xX" else int(body[1:])
        except ValueError:
            return m.group(0)
        if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
            return chr(cp)
        return m.group(0)
    return _ENTITIES.get(body, m.group(0))


def _tag_repl(m: re.Match) -> str:
    return "\n" if m.group(1).lower() in _BLOCK_TAGS else " "


def extract_text(html: bytes | bytearray | memoryview | str | None) -> str:
    """html bytes → canonical extracted text. Pure, total, deterministic."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        s = bytes(html).decode("utf-8", errors="replace")
    else:
        s = html
    s = _COMMENT_RE.sub(" ", s)
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _DOCTYPE_RE.sub(" ", s)
    s = _TAG_RE.sub(_tag_repl, s)
    s = _ENTITY_RE.sub(_decode_entity, s)
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    lines = [_HSPACE_RE.sub(" ", ln).strip() for ln in s.split("\n")]
    out = "\n".join(ln for ln in lines if ln)
    return unicodedata.normalize("NFC", out)


_SENT_SPLIT_RE = re.compile(r"(?<=[.!?]) ")


def split_sentences(text: str) -> list[tuple[int, int, int]]:
    """→ [(sent_id, begin, end)] char spans into ``text``.

    Sentences never span lines; within a line, split after [.!?]+space.
    Spans exclude surrounding whitespace. Deterministic, offset-stable.
    """
    out: list[tuple[int, int, int]] = []
    sid = 0
    pos = 0
    for line in text.split("\n"):
        start = pos
        if line:
            cursor = 0
            for m in _SENT_SPLIT_RE.finditer(line):
                seg = line[cursor : m.start()]
                if seg.strip():
                    out.append((sid, start + cursor, start + m.start()))
                    sid += 1
                cursor = m.end()
            if line[cursor:].strip():
                out.append((sid, start + cursor, start + len(line)))
                sid += 1
        pos = start + len(line) + 1  # +1 for the '\n'
    return out


_TOKEN_RE = re.compile(r"\S+")
_TRAIL_PUNCT_RE = re.compile(r"[.,;:!?)\]\"']+$")
_LEAD_PUNCT_RE = re.compile(r"^[(\[\"']+")


def tokenize(sentence: str, base: int = 0) -> list[tuple[int, int, str]]:
    """Whitespace tokens → [(begin, end, token)] with offsets + ``base``."""
    return [
        (base + m.start(), base + m.end(), m.group(0))
        for m in _TOKEN_RE.finditer(sentence)
    ]


def tokenize_span(text: str, sb: int, se: int) -> list[tuple[int, int, str]]:
    """``tokenize(text[sb:se], base=sb)`` without the slice copy:
    finditer's pos/endpos bound the scan in place and offsets come out
    absolute.  \\S+ cannot match across the [sb, se) boundary any
    differently than it matches inside a slice, so the token lists are
    identical by construction (pinned by test_extract.py)."""
    return [
        (m.start(), m.end(), m.group(0))
        for m in _TOKEN_RE.finditer(text, sb, se)
    ]


@lru_cache(maxsize=65536)
def norm_surface(s: str) -> str:
    """Alias-normal form used on BOTH sides of the KB alias join:
    NFC, lowercase, leading/trailing punct stripped, inner dots kept,
    whitespace collapsed.  Pinned — kb_aliases.alias_norm uses it too.
    Pure string→string, so the lru_cache only skips recomputation —
    the surface vocabulary is tiny relative to mention occurrences
    (~35 calls/doc, mostly repeats)."""
    s = unicodedata.normalize("NFC", s)
    toks = []
    for t in s.split():
        # lstrip/rstrip char classes == _LEAD_PUNCT_RE/_TRAIL_PUNCT_RE
        # (maximal run from each end), at C speed
        t = t.lstrip("([\"'").rstrip(".,;:!?)]\"'")
        if t:
            toks.append(t.lower())
    return " ".join(toks)
