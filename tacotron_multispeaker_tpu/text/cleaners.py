"""Text cleaners pipeline.

Mirrors the reference lineage's ``text/cleaners.py`` (SURVEY.md §2.2):
``basic_cleaners`` (lowercase + whitespace), ``transliteration_cleaners``
(ASCII-fold + basic), and ``english_cleaners`` (ASCII-fold, lowercase, number
and abbreviation expansion, whitespace collapse).  The reference used the
``unidecode`` package for ASCII folding; it is unavailable here, so
:func:`transliterate` implements Unicode NFKD-based folding with a supplement
table for common non-decomposable characters.
"""

from __future__ import annotations

import re
import unicodedata

from .numbers import normalize_numbers

_whitespace_re = re.compile(r"\s+")

# Characters NFKD cannot decompose to ASCII.
_TRANSLIT_SUPPLEMENT = {
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE", "ß": "ss", "ø": "o",
    "Ø": "O", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D", "þ": "th", "Þ": "Th",
    "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H", "ı": "i", "ĸ": "k", "ŋ": "ng",
    "Ŋ": "NG", "ŧ": "t", "Ŧ": "T", "—": "-", "–": "-", "‘": "'", "’": "'",
    "“": '"', "”": '"', "…": "...", "«": '"', "»": '"', "¡": "", "¿": "",
}

_ABBREVIATIONS = [
    (re.compile(rf"\b{abbr}\.", re.IGNORECASE), expansion)
    for abbr, expansion in [
        ("mrs", "misess"), ("mr", "mister"), ("dr", "doctor"), ("st", "saint"),
        ("co", "company"), ("jr", "junior"), ("maj", "major"), ("gen", "general"),
        ("drs", "doctors"), ("rev", "reverend"), ("lt", "lieutenant"),
        ("hon", "honorable"), ("sgt", "sergeant"), ("capt", "captain"),
        ("esq", "esquire"), ("ltd", "limited"), ("col", "colonel"), ("ft", "fort"),
    ]
]


def transliterate(text: str) -> str:
    """Fold Unicode text to ASCII (stand-in for unidecode)."""
    out = []
    for ch in text:
        if ord(ch) < 128:
            out.append(ch)
            continue
        if ch in _TRANSLIT_SUPPLEMENT:
            out.append(_TRANSLIT_SUPPLEMENT[ch])
            continue
        decomposed = unicodedata.normalize("NFKD", ch)
        ascii_part = "".join(c for c in decomposed if ord(c) < 128)
        out.append(ascii_part)
    return "".join(out)


def expand_abbreviations(text: str) -> str:
    for pattern, expansion in _ABBREVIATIONS:
        text = re.sub(pattern, expansion, text)
    return text


def expand_numbers(text: str) -> str:
    return normalize_numbers(text)


def lowercase(text: str) -> str:
    return text.lower()


def collapse_whitespace(text: str) -> str:
    return re.sub(_whitespace_re, " ", text)


def basic_cleaners(text: str) -> str:
    """Lowercase + whitespace collapse; no transliteration (any language)."""
    return collapse_whitespace(lowercase(text))


def transliteration_cleaners(text: str) -> str:
    """ASCII-fold non-English text, then basic cleaning."""
    return collapse_whitespace(lowercase(transliterate(text)))


def english_cleaners(text: str) -> str:
    """Full English pipeline: fold, lowercase, expand numbers/abbreviations."""
    text = transliterate(text)
    text = lowercase(text)
    text = expand_numbers(text)
    text = expand_abbreviations(text)
    text = collapse_whitespace(text)
    return text


CLEANERS = {
    "basic_cleaners": basic_cleaners,
    "transliteration_cleaners": transliteration_cleaners,
    "english_cleaners": english_cleaners,
}
