"""Symbol set defining the text-embedding vocabulary.

Mirrors the reference lineage's ``text/symbols.py`` (SURVEY.md §2.2): a pad
symbol, an EOS symbol, printable ASCII, and the ARPAbet phoneme inventory
(prefixed with ``@`` so graphemes and phonemes can be mixed in one sequence).
The length of :data:`symbols` defines the embedding vocab size.
"""

from __future__ import annotations

# ARPAbet phoneme inventory (CMUdict symbol set, with stress markers).
VALID_ARPABET = [
    "AA", "AA0", "AA1", "AA2", "AE", "AE0", "AE1", "AE2", "AH", "AH0", "AH1",
    "AH2", "AO", "AO0", "AO1", "AO2", "AW", "AW0", "AW1", "AW2", "AY", "AY0",
    "AY1", "AY2", "B", "CH", "D", "DH", "EH", "EH0", "EH1", "EH2", "ER", "ER0",
    "ER1", "ER2", "EY", "EY0", "EY1", "EY2", "F", "G", "HH", "IH", "IH0",
    "IH1", "IH2", "IY", "IY0", "IY1", "IY2", "JH", "K", "L", "M", "N", "NG",
    "OW", "OW0", "OW1", "OW2", "OY", "OY0", "OY1", "OY2", "P", "R", "S", "SH",
    "T", "TH", "UH", "UH0", "UH1", "UH2", "UW", "UW0", "UW1", "UW2", "V", "W",
    "Y", "Z", "ZH",
]

_pad = "_"
_eos = "~"
_characters = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz!'(),-.:;? "
# Digits appended AFTER ARPAbet so pre-existing symbol ids stay stable.
# They carry pinyin tone marks for the Chinese corpora the fork lineage
# adds (SURVEY.md §2.4, e.g. THCHS-30 "yang2 chun1"); English numerals are
# still expanded to words by english_cleaners before reaching here.
_digits = "0123456789"

# Prefix ARPAbet symbols with '@' to distinguish them from graphemes.
_arpabet = ["@" + s for s in VALID_ARPABET]

symbols: list[str] = [_pad, _eos] + list(_characters) + _arpabet + list(_digits)

PAD_ID = 0
EOS_ID = 1

symbol_to_id: dict[str, int] = {s: i for i, s in enumerate(symbols)}
id_to_symbol: dict[int, str] = {i: s for i, s in enumerate(symbols)}
