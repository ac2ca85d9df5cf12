"""Text frontend tests: golden text->id sequences (SURVEY.md §4.1)."""

import io

from tacotron_multispeaker_tpu.text import (
    EOS_ID, PAD_ID, CMUDict, sequence_to_text, symbols, text_to_sequence,
    vocab_size)
from tacotron_multispeaker_tpu.text.cleaners import (
    basic_cleaners, english_cleaners, transliteration_cleaners, transliterate)
from tacotron_multispeaker_tpu.text.numbers import (
    normalize_numbers, number_to_words, ordinal_to_words)


def test_symbol_set():
    assert symbols[PAD_ID] == "_"
    assert symbols[EOS_ID] == "~"
    assert len(symbols) == len(set(symbols))
    # pad + eos + 63 characters + 84 arpabet + 10 digits = 159
    assert vocab_size() == 159


def test_roundtrip():
    seq = text_to_sequence("hello world.", "basic_cleaners")
    assert seq[-1] == EOS_ID
    assert sequence_to_text(seq) == "hello world.~"


def test_eos_appended_and_pad_excluded():
    seq = text_to_sequence("abc", "basic_cleaners")
    assert seq[-1] == EOS_ID
    assert PAD_ID not in seq


def test_arpabet_braces():
    seq = text_to_sequence("turn {HH W AY1 T} left", "english_cleaners")
    text = sequence_to_text(seq)
    assert "{HH W AY1 T}" in text


def test_english_cleaners_numbers():
    assert english_cleaners("I have $3.50 and 16 cats") == \
        "i have three dollars, fifty cents and sixteen cats"
    assert english_cleaners("in 1902 A.D.") == "in nineteen oh two a.d."
    assert english_cleaners("Dr. Smith lives on 3rd St.") == \
        "doctor smith lives on third saint"


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(21) == "twenty-one"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(1234567) == \
        "one million two hundred thirty-four thousand five hundred sixty-seven"


def test_ordinals():
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(3) == "third"
    assert ordinal_to_words(12) == "twelfth"
    assert ordinal_to_words(20) == "twentieth"
    assert ordinal_to_words(21) == "twenty-first"
    assert ordinal_to_words(113) == "one hundred thirteenth"


def test_normalize_numbers_year_styles():
    assert normalize_numbers("2000") == "two thousand"
    assert normalize_numbers("2008") == "two thousand eight"
    assert normalize_numbers("1900") == "nineteen hundred"
    assert normalize_numbers("1865") == "eighteen sixty-five"
    assert normalize_numbers("12,345") == \
        "twelve thousand three hundred forty-five"
    assert normalize_numbers("3.14") == "three point one four"


def test_transliterate():
    assert transliterate("café") == "cafe"
    assert transliterate("Müller") == "Muller"
    assert transliterate("Ærøskøbing") == "AEroskobing"
    assert transliteration_cleaners("  CAFÉ   naïve ") == " cafe naive "


def test_basic_cleaners():
    assert basic_cleaners("Hello   WORLD") == "hello world"


def test_unknown_symbols_dropped():
    seq = text_to_sequence("a#b", "basic_cleaners")
    assert sequence_to_text(seq) == "ab~"


def test_cmudict_parse():
    data = io.StringIO(
        ";;; comment\n"
        "HELLO  HH AH0 L OW1\n"
        "WORLD  W ER1 L D\n"
        "WORLD(1)  W ER1 L D\n"
        "BADSYM  QQ ZZ\n"
    )
    d = CMUDict(data)
    assert len(d) == 2
    assert d.lookup("hello") == ["HH AH0 L OW1"]
    assert d.lookup("world") == ["W ER1 L D", "W ER1 L D"]
    assert d.lookup("nothere") is None


def test_cmudict_unambiguous_filter():
    data = io.StringIO("A  AH0\nA(1)  EY1\nB  B IY1\n")
    d = CMUDict(data, keep_ambiguous=False)
    assert d.lookup("a") is None
    assert d.lookup("b") == ["B IY1"]
