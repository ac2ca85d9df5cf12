"""Number normalization: digits -> English words.

Replaces the reference lineage's ``text/numbers.py`` (SURVEY.md §2.2), which
depended on the ``inflect`` package (not available in this environment).  A
self-contained number-to-words engine covering the same cases: commas in
numbers, decimals, pounds, dollars, ordinals, and plain cardinals (with the
"nineteen-oh-two" year style for 4-digit numbers, as in the reference).
"""

from __future__ import annotations

import re

_comma_number_re = re.compile(r"([0-9][0-9\,]+[0-9])")
_decimal_number_re = re.compile(r"([0-9]+\.[0-9]+)")
_pounds_re = re.compile(r"£([0-9\,]*[0-9]+)")
_dollars_re = re.compile(r"\$([0-9\.\,]*[0-9]+)")
_ordinal_re = re.compile(r"[0-9]+(st|nd|rd|th)")
_number_re = re.compile(r"[0-9]+")

_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
         "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]
_SCALES = [(10 ** 12, "trillion"), (10 ** 9, "billion"), (10 ** 6, "million"),
           (10 ** 3, "thousand"), (100, "hundred")]

_ORDINAL_IRREGULAR = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def _two_digits_to_words(n: int) -> str:
    if n < 20:
        return _ONES[n]
    tens, ones = divmod(n, 10)
    if ones == 0:
        return _TENS[tens]
    return f"{_TENS[tens]}-{_ONES[ones]}"


def number_to_words(n: int, andword: str = "") -> str:
    """Cardinal words for a non-negative integer, e.g. 1234 ->
    'one thousand two hundred thirty-four'."""
    if n < 0:
        return "minus " + number_to_words(-n, andword)
    if n < 100:
        return _two_digits_to_words(n)
    for scale, name in _SCALES:
        if n >= scale:
            major, rest = divmod(n, scale)
            words = number_to_words(major, andword) + " " + name
            if rest:
                joiner = f" {andword} " if andword else " "
                words += joiner + number_to_words(rest, andword)
            return words
    raise AssertionError("unreachable")


def ordinal_to_words(n: int) -> str:
    words = number_to_words(n)
    head, _, last = words.rpartition(" ") if " " in words else ("", "", words)
    hhead, hyph, hlast = last.rpartition("-") if "-" in last else ("", "", last)
    if hlast in _ORDINAL_IRREGULAR:
        ord_last = _ORDINAL_IRREGULAR[hlast]
    elif hlast.endswith("y"):
        ord_last = hlast[:-1] + "ieth"
    else:
        ord_last = hlast + "th"
    last = (hhead + hyph + ord_last) if hyph else ord_last
    return (head + " " + last).strip()


def _remove_commas(m: re.Match) -> str:
    return m.group(1).replace(",", "")


def _expand_decimal_point(m: re.Match) -> str:
    whole, _, frac = m.group(1).partition(".")
    digits = " ".join(_ONES[int(d)] for d in frac)
    return f"{number_to_words(int(whole))} point {digits}"


def _expand_pounds(m: re.Match) -> str:
    return m.group(1) + " pounds"


def _expand_dollars(m: re.Match) -> str:
    match = m.group(1)
    parts = match.split(".")
    if len(parts) > 2:
        return match + " dollars"
    dollars = int(parts[0]) if parts[0] else 0
    cents = int(parts[1].ljust(2, "0")[:2]) if len(parts) > 1 and parts[1] else 0
    if dollars and cents:
        d_unit = "dollar" if dollars == 1 else "dollars"
        c_unit = "cent" if cents == 1 else "cents"
        return f"{dollars} {d_unit}, {cents} {c_unit}"
    if dollars:
        return f"{dollars} {'dollar' if dollars == 1 else 'dollars'}"
    if cents:
        return f"{cents} {'cent' if cents == 1 else 'cents'}"
    return "zero dollars"


def _expand_ordinal(m: re.Match) -> str:
    return ordinal_to_words(int(m.group(0)[:-2]))


def _expand_number(m: re.Match) -> str:
    num = int(m.group(0))
    # Year-style reading for 4-digit numbers (reference behavior).
    if 1000 < num < 3000:
        if num == 2000:
            return "two thousand"
        if 2000 < num < 2010:
            return "two thousand " + number_to_words(num % 100)
        if num % 100 == 0:
            return number_to_words(num // 100) + " hundred"
        century = number_to_words(num // 100)
        rest = num % 100
        if rest < 10:
            return f"{century} oh {_ONES[rest]}"
        return f"{century} {_two_digits_to_words(rest)}"
    return number_to_words(num)


def normalize_numbers(text: str) -> str:
    text = re.sub(_comma_number_re, _remove_commas, text)
    text = re.sub(_pounds_re, _expand_pounds, text)
    text = re.sub(_dollars_re, _expand_dollars, text)
    text = re.sub(_decimal_number_re, _expand_decimal_point, text)
    text = re.sub(_ordinal_re, _expand_ordinal, text)
    text = re.sub(_number_re, _expand_number, text)
    return text
