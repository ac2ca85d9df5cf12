"""CMU pronouncing dictionary loader.

Mirrors the reference lineage's ``text/cmudict.py`` (SURVEY.md §2.2): parse
the cmudict-0.7b file format into ``word -> [pronunciations]`` where each
pronunciation is a space-separated ARPAbet string.  Used by the data feeder
for random pronunciation augmentation and by ``text_to_sequence`` for
``{ARPABET IN BRACES}`` spans.
"""

from __future__ import annotations

import re
from typing import IO

from .symbols import VALID_ARPABET

_alt_re = re.compile(r"\([0-9]+\)")
_VALID = set(VALID_ARPABET)


class CMUDict:
    """Thin wrapper around cmudict-0.7b data."""

    def __init__(self, file_or_path: str | IO[str], keep_ambiguous: bool = True):
        if isinstance(file_or_path, str):
            with open(file_or_path, encoding="latin-1") as f:
                entries = _parse_cmudict(f)
        else:
            entries = _parse_cmudict(file_or_path)
        if not keep_ambiguous:
            entries = {w: p for w, p in entries.items() if len(p) == 1}
        self._entries = entries

    def __len__(self) -> int:
        return len(self._entries)

    def lookup(self, word: str) -> list[str] | None:
        """ARPAbet pronunciations of ``word``, or None if not found."""
        return self._entries.get(word.upper())


def _parse_cmudict(file: IO[str]) -> dict[str, list[str]]:
    cmudict: dict[str, list[str]] = {}
    for line in file:
        if len(line) and (line[0] >= "A" and line[0] <= "Z" or line[0] == "'"):
            parts = line.split("  ")
            if len(parts) != 2:
                continue
            word = re.sub(_alt_re, "", parts[0])
            pronunciation = _get_pronunciation(parts[1])
            if pronunciation:
                if word in cmudict:
                    cmudict[word].append(pronunciation)
                else:
                    cmudict[word] = [pronunciation]
    return cmudict


def _get_pronunciation(s: str) -> str | None:
    parts = s.strip().split(" ")
    for part in parts:
        if part not in _VALID:
            return None
    return " ".join(parts)
