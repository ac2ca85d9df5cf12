"""Text frontend: grapheme / ARPAbet -> integer ID sequences.

Mirrors the reference lineage's ``text/__init__.py`` (SURVEY.md §2.2):
``text_to_sequence(text, cleaner_names)`` runs the cleaners pipeline and maps
symbols to IDs, honouring ``{ARPABET SPANS}`` in curly braces; an EOS id is
appended.  ``sequence_to_text`` inverts it for debugging.
"""

from __future__ import annotations

import re

from .cleaners import CLEANERS
from .cmudict import CMUDict
from .symbols import EOS_ID, PAD_ID, symbols, symbol_to_id, id_to_symbol

__all__ = [
    "text_to_sequence", "sequence_to_text", "symbols", "CMUDict",
    "PAD_ID", "EOS_ID", "vocab_size",
]

_curly_re = re.compile(r"(.*?)\{(.+?)\}(.*)")


def vocab_size() -> int:
    return len(symbols)


def _clean_text(text: str, cleaner_names: list[str] | str) -> str:
    if isinstance(cleaner_names, str):
        cleaner_names = [c.strip() for c in cleaner_names.split(",") if c.strip()]
    for name in cleaner_names:
        cleaner = CLEANERS.get(name)
        if cleaner is None:
            raise KeyError(f"unknown cleaner {name!r}")
        text = cleaner(text)
    return text


def _symbols_to_sequence(syms) -> list[int]:
    return [symbol_to_id[s] for s in syms if _should_keep(s)]


def _arpabet_to_sequence(text: str) -> list[int]:
    return _symbols_to_sequence(["@" + s for s in text.split()])


def _should_keep(s: str) -> bool:
    return s in symbol_to_id and s not in ("_", "~")


def text_to_sequence(text: str, cleaner_names: list[str] | str) -> list[int]:
    """Convert text to a list of symbol IDs.

    Text may contain ARPAbet spans in curly braces, e.g.
    ``"Turn left on {HH W AY1 T} Street."`` — these bypass the cleaners.
    An EOS id is appended.
    """
    sequence: list[int] = []
    while text:
        m = _curly_re.match(text)
        if not m:
            sequence += _symbols_to_sequence(_clean_text(text, cleaner_names))
            break
        sequence += _symbols_to_sequence(_clean_text(m.group(1), cleaner_names))
        sequence += _arpabet_to_sequence(m.group(2))
        text = m.group(3)
    sequence.append(EOS_ID)
    return sequence


def sequence_to_text(sequence) -> str:
    """Invert :func:`text_to_sequence` (ARPAbet symbols re-wrapped in braces)."""
    result = ""
    for sid in sequence:
        s = id_to_symbol.get(int(sid))
        if s is None:
            continue
        if len(s) > 1 and s[0] == "@":
            s = "{%s}" % s[1:]
        result += s
    return result.replace("}{", " ")
