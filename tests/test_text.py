"""Text front-end tests (symbol table, cleaners, tokenization)."""

import numpy as np
import pytest

from multi_speaker_tts_tpu import text


def test_symbols_unique():
    assert len(text.symbols) == len(set(text.symbols))
    assert text.symbols[text.PAD_ID] == text.PAD
    assert text.symbols[text.EOS_ID] == text.EOS


def test_english_cleaners_abbreviations():
    assert text.english_cleaners("Dr. Smith met Mr. Jones.") == (
        "doctor smith met mister jones."
    )


def test_english_cleaners_numbers():
    assert text.english_cleaners("I have 21 cats") == "i have twenty one cats"
    assert text.english_cleaners("year 1999") == (
        "year one thousand nine hundred ninety nine"
    )
    assert text.english_cleaners("0 and 100") == "zero and one hundred"


def test_english_cleaners_strips_unknown():
    assert text.english_cleaners("héllo\tworld\n") == "hllo world"


def test_text_to_sequence_roundtrip():
    ids = text.text_to_sequence("hello, world!")
    assert ids.dtype == np.int32
    assert ids[-1] == text.EOS_ID
    assert text.sequence_to_text(ids[:-1]) == "hello, world!"


def test_text_to_sequence_empty():
    ids = text.text_to_sequence("")
    assert list(ids) == [text.EOS_ID]


def test_unknown_cleaner_raises():
    with pytest.raises(ValueError, match="Unknown cleaner"):
        text.clean_text("x", ["bogus_cleaners"])


def test_number_to_words_large():
    assert text._number_to_words(1_000_000) == "one million"
    assert (
        text._number_to_words(123_456)
        == "one hundred twenty three thousand four hundred fifty six"
    )
