"""Pure-Python text normalization with the reference's exact semantics.

Fresh implementation of the behavior documented and tested in the
reference (semantics studied at /root/reference/src/transformations.py:
normalize_whitespace :67-138, normalize_unicode_nfc :141-155,
convert_html_entities :158-176, normalize_markdown_links :179-240,
normalize_abbreviations :243-267, normalize_wikidata_url :270-294,
normalize_urls :297-316, apply_text_transformations :423-464 [ordered
composition], extract_wikidata_qids :911-934).

These functions are the ground truth for "per-turn text equality vs the
reference" (BASELINE.json input_hint): the Arrow-vectorized pandas UDF
in ``vectorized.py`` maps them over Series batches, and the pytest
parity suite checks the native column-expression fast path against them
on the fixture corpus. Python ``re`` is used deliberately — exact-parity
cases must not depend on Java-regex dialect differences.
"""

from __future__ import annotations

import html
import re
import unicodedata

# --- F1: whitespace -------------------------------------------------------

_CHARMAP = {
    # removed outright: soft hyphen, word joiner, zero-widths, BOM, bidi ctrls
    **dict.fromkeys(
        map(ord, "\u00ad\u2060\u200b\u200c\u200d\ufeff\u202a\u202b\u202c\u202d\u202e")
    ),
    # unified to a regular space: NBSP, narrow NBSP, figure space, tab
    **{ord(c): " " for c in "\u00a0\u202f\u2007\t"},
    # unified to newline: line / paragraph separator
    **{ord(c): "\n" for c in "\u2028\u2029"},
}
_UNI_SPACES = re.compile("[\u2000-\u200a]")
_MULTI_SPACE = re.compile(r" {2,}")
_MULTI_NL = re.compile(r"\n{3,}")


def normalize_whitespace(text: str | None) -> str | None:
    """Drop invisible/bidi chars, unify exotic spaces, collapse runs,
    rstrip each line, strip the whole string."""
    if not text:
        return text
    text = text.translate(_CHARMAP)
    text = _UNI_SPACES.sub(" ", text)
    text = _MULTI_SPACE.sub(" ", text)
    text = _MULTI_NL.sub("\n\n", text)
    text = "\n".join(line.rstrip() for line in text.split("\n"))
    return text.strip()


# --- F2 / F3 ---------------------------------------------------------------

def normalize_unicode_nfc(text: str | None) -> str | None:
    return unicodedata.normalize("NFC", text) if text else text


def convert_html_entities(text: str | None) -> str | None:
    return html.unescape(text) if text else text


# --- F4: markdown links ----------------------------------------------------

_URLISH = re.compile(r"https?://|www\.|[a-z]+\.(com|org|net|de|ch|edu|gov|io|co)", re.IGNORECASE)
_REV_PAREN_BRACKET = re.compile(r"\(([^)]+)\)\[([^\]]+)\]")
_STD_MD = re.compile(r"\[([^\]]+)\]\(([^)]+)\)")
_BARE_URL_AFTER_LABEL = re.compile(r"\[([^\]]+)\]\s+(https?://[^\s\)]+)(?![)])")


def normalize_markdown_links(text: str | None) -> str | None:
    """Repair malformed markdown links using URL-shape heuristics:
    (URL)[label] / (label)[URL] → [label](URL); [URL](label) →
    [label](URL); [label] URL → [label](URL); ambiguous → unchanged."""
    if not text:
        return text

    def fix_reversed(m: re.Match[str]) -> str:
        a, b = m.group(1), m.group(2)
        if _URLISH.search(a):
            return f"[{b}]({a})"
        if _URLISH.search(b):
            return f"[{a}]({b})"
        return m.group(0)

    def fix_swapped(m: re.Match[str]) -> str:
        a, b = m.group(1), m.group(2)
        if _URLISH.search(a) and not _URLISH.search(b):
            return f"[{b}]({a})"
        return m.group(0)

    text = _REV_PAREN_BRACKET.sub(fix_reversed, text)
    text = _STD_MD.sub(fix_swapped, text)
    text = _BARE_URL_AFTER_LABEL.sub(r"[\1](\2)", text)
    return text


# --- F5 / F6 / F7 -----------------------------------------------------------

_ABBR_J = re.compile(r"\b[dD]\.?\s*[jJ]\.?(?=\s|$|[^\w])")
_ABBR_AE = re.compile(r"\b[dD]\.?\s*[äÄ]\.?(?=\s|$|[^\w])")
_WIKIDATA_MOBILE = re.compile(r"(?:https?://)?m\.wikidata\.org/wiki/(Q\d+)")
_TRAILING_SLASH = re.compile(r"(https?://[^/\s]+)/+(?=\s|$)")


def normalize_abbreviations(text: str | None) -> str | None:
    if not text:
        return text
    text = _ABBR_J.sub("d. J.", text)
    return _ABBR_AE.sub("d. Ä.", text)


def normalize_wikidata_url(text: str | None) -> str | None:
    if not text:
        return text
    return _WIKIDATA_MOBILE.sub(r"https://www.wikidata.org/wiki/\1", text)


def normalize_urls(text: str | None) -> str | None:
    """Strip redundant trailing slashes from bare-domain URLs at token end."""
    if not text:
        return text
    return _TRAILING_SLASH.sub(r"\1", text)


# --- F8: ordered composition -------------------------------------------------

def apply_text_transformations(text: str | None) -> str | None:
    """Entities → NFC → whitespace → abbreviations → markdown → wikidata →
    URLs. Order matters (entities can produce denormalized chars; NFC can
    produce collapsible whitespace context). The reference's optional
    network HTTPS-upgrade stage (transformations.py:319-420) is
    deliberately absent — the engine is offline."""
    if not text:
        return text
    text = convert_html_entities(text)
    text = normalize_unicode_nfc(text)
    text = normalize_whitespace(text)
    text = normalize_abbreviations(text)
    text = normalize_markdown_links(text)
    text = normalize_wikidata_url(text)
    text = normalize_urls(text)
    return text


# --- F11: QIDs ---------------------------------------------------------------

_QID = re.compile(r"\bQ\d+\b")


def extract_wikidata_qids(text: str | None) -> list[str]:
    """All QIDs, order-preserving dedup."""
    if not text:
        return []
    seen: set[str] = set()
    out: list[str] = []
    for q in _QID.findall(text):
        if q not in seen:
            seen.add(q)
            out.append(q)
    return out


def normalize_name(name: str | None) -> str:
    """Lowercased, fully normalized — for entity dedup keys."""
    if not name:
        return ""
    return (apply_text_transformations(name) or "").lower()


# --- J5: fuzzy-match scorer (exact-parity path) -----------------------------

_DASHES = str.maketrans({"–": "-", "—": "-", "−": "-"})
_COMBINING = re.compile("[̀-ͯ]")
_NON_ALNUM = re.compile(r"[^a-z0-9]+")
_WS = re.compile(r"\s+")

#: the reference's domain stopword patterns (transformations.py:543-557)
_MATCH_STOPWORDS = [
    re.compile(r"\(hg[.,:]?\)|\bhg[.,:]?"),
    re.compile(r"\bstadt\.?geschichte\.?basel\b"),
    re.compile(r"\bbasel\b|\bbd\.?\b|\bband\b"),
]


def normalize_match_text(text: str | None, stopwords: list[re.Pattern] | None = None) -> str:
    """Normalization for fuzzy title matching, reference parity
    (transformations.py:543-557): NFKC+lower, dash unification, NFKD +
    combining-mark strip (de-diacritic), domain stopword removal,
    alnum-only word soup."""
    if not text:
        return ""
    text = unicodedata.normalize("NFKC", text).lower().translate(_DASHES)
    text = unicodedata.normalize("NFKD", text)
    text = _COMBINING.sub("", text)
    text = text.replace("chr.", "chr")
    for pat in _MATCH_STOPWORDS if stopwords is None else stopwords:
        text = pat.sub(" ", text)
    text = _NON_ALNUM.sub(" ", text)
    return _WS.sub(" ", text).strip()


def partial_ratio(needle: str, haystack: str) -> float:
    """How much of ``needle`` appears within ``haystack`` — directional
    sliding-window SequenceMatcher, reference parity
    (transformations.py:565-583). Directionality is load-bearing: a
    haystack shorter than the needle cannot contain it and scores low
    (the reference added this to kill a documented short-citation false
    positive)."""
    from difflib import SequenceMatcher

    if not needle or not haystack:
        return 0.0
    if needle in haystack:
        return 1.0
    window = len(needle)
    best = 0.0
    for i in range(0, max(len(haystack) - window + 1, 1)):
        score = SequenceMatcher(None, needle, haystack[i : i + window]).ratio()
        if score > best:
            best = score
    return best


# --- J3: Iconclass parts (exact-parity path) --------------------------------

_ICONCLASS_CHARSET = re.compile(r"^[0-9A-Zq()+\s.]*$")
_ICONCLASS_SPLIT = re.compile(r"(\(.+?\))")


def iconclass_parts(notation: str) -> list[str]:
    """Hierarchical expansion of an Iconclass notation — exact parity
    with the reference splitter (/root/reference/src/iconclass.py:64-99,
    golden cases test/test_iconclass.py): char-prefixes for base
    segments, ``(...)`` placeholder + literal part per parenthetical
    qualifier, incremental keys for ``(+XYZ)`` additions. This is the
    ground truth for the exotic inputs (unclosed parens etc.) the native
    ``operators.iconclass`` path gates out; wrap in a pandas UDF for
    bulk exact-parity scans."""
    parts: list[str] = []
    last = ""
    for seg in _ICONCLASS_SPLIT.split(notation):
        if not seg:
            continue
        if seg.startswith("(+"):
            base = last + "(+"
            for ch in seg[2:]:
                if ch != ")":
                    parts.append(base + ch + ")")
                    base += ch
            if parts:
                last = parts[-1]
        elif seg.startswith("(") and seg.endswith(")"):
            if seg != "(...)":
                parts.append(last + "(...)")
            parts.append(last + seg)
            last = parts[-1]
        else:
            for ch in seg:
                parts.append(last + ch)
                last = parts[-1]
    return parts


def iconclass_is_valid(notation: str | None, vocabulary: set[str]) -> bool:
    """Format gate + hierarchical membership, reference semantics
    (vocabularies.py:57-87): any part in the vocabulary, or the notation
    starts with any vocabulary code."""
    if not notation or not notation.strip():
        return False
    if not _ICONCLASS_CHARSET.match(notation):
        return False
    if any(p in vocabulary for p in iconclass_parts(notation)):
        return True
    return any(notation.startswith(code) for code in vocabulary)
