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


# --- phoneme front-end (Tokens.Use_Phoneme) ---------------------------------

def test_phoneme_symbols_disjoint_and_stable():
    from multi_speaker_tts_tpu.text import PAD_ID, EOS_ID
    from multi_speaker_tts_tpu.text import phonemes as ph

    assert len(set(ph.phoneme_symbols)) == len(ph.phoneme_symbols)
    # PAD/EOS ids line up with the character table (shared collate code).
    assert ph.PAD_ID == PAD_ID and ph.EOS_ID == EOS_ID


def test_phonemize_basic():
    from multi_speaker_tts_tpu.text import phonemes as ph

    out = ph.phonemize("this ship")
    assert out[0] == "@DH" or out[0] == "@TH"  # 'th' digraph
    assert " " in out
    assert "@SH" in out  # 'sh' digraph
    assert all(s.startswith("@") or s in (" ",) for s in out)


def test_g2p_magic_e():
    from multi_speaker_tts_tpu.text import phonemes as ph

    assert ph.g2p_fallback("mate") == ["M", "EY1", "T"]
    assert ph.g2p_fallback("bite") == ["B", "AY1", "T"]


def test_phoneme_lexicon_override(tmp_path):
    from multi_speaker_tts_tpu.text import phonemes as ph

    lex = tmp_path / "lex.dict"
    lex.write_text("HELLO  HH AH0 L OW1\nHELLO(2)  HH EH0 L OW1\n")
    lexicon = ph.load_lexicon(str(lex))
    out = ph.phonemize("hello", lexicon)
    assert out == ["@HH", "@AH0", "@L", "@OW1"]


def test_lexicon_real_cmudict_format(tmp_path):
    """load_lexicon against the actual CMUdict 0.7b file conventions:
    ';;;' header comments, punctuation-named entries, (N) pronunciation
    alternates, apostrophe words, and stress-marked phones (VERDICT r2
    item 6: the lexicon path vs the real file format)."""
    from multi_speaker_tts_tpu.text import phonemes as ph

    lex = tmp_path / "cmudict-0.7b"
    lex.write_text(
        ";;; # CMUdict  -- Major Version: 0.07\n"
        ";;; \n"
        "!EXCLAMATION-POINT  EH2 K S K L AH0 M EY1 SH AH0 N P OY2 N T\n"
        "\"CLOSE-QUOTE  K L OW1 Z K W OW1 T\n"
        "'TIS  T IH1 Z\n"
        "A  AH0\n"
        "A(1)  EY1\n"
        "ABANDON  AH0 B AE1 N D AH0 N\n"
        "ABANDON(1)  AH0 B AE1 N D IH0 N\n"
        "QUICK  K W IH1 K\n"
        "\n",
        encoding="latin-1",
    )
    lexicon = ph.load_lexicon(str(lex))
    assert lexicon["a"] == ["AH0"]  # first pronunciation wins
    assert lexicon["abandon"] == ["AH0", "B", "AE1", "N", "D", "AH0", "N"]
    assert lexicon["quick"] == ["K", "W", "IH1", "K"]
    assert "a(1)" not in lexicon  # alternates skipped
    # End-to-end through the Use_Phoneme id pipeline with the lexicon file.
    ids = ph.phoneme_text_to_sequence("a quick abandon", lexicon_path=str(lex))
    want = (
        ["@AH0", " "]
        + [f"@{p}" for p in lexicon["quick"]]
        + [" "]
        + [f"@{p}" for p in lexicon["abandon"]]
    )
    got = [ph.phoneme_symbols[i] for i in ids[:-1]]
    assert got == want
    assert ids[-1] == ph.EOS_ID


def test_encode_text_dispatch(tiny_hp):
    import numpy as np

    from multi_speaker_tts_tpu.text import encode_text, vocab_size, symbols
    from multi_speaker_tts_tpu.text import phonemes as ph

    hp_char = tiny_hp
    hp_ph = tiny_hp.replace(Tokens={"Use_Phoneme": True})
    char_ids = encode_text("Hello world.", hp_char)
    ph_ids = encode_text("Hello world.", hp_ph)
    assert char_ids.dtype == np.int32 and ph_ids.dtype == np.int32
    assert vocab_size(hp_char) == len(symbols)
    assert vocab_size(hp_ph) == len(ph.phoneme_symbols)
    assert ph_ids.max() < vocab_size(hp_ph)
    assert ph_ids[-1] == ph.EOS_ID


def test_phoneme_model_trains(tiny_hp):
    """Use_Phoneme: true sizes the embedding to the phoneme inventory and the
    train step runs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multi_speaker_tts_tpu.text import encode_text, vocab_size
    from multi_speaker_tts_tpu.train import trainer as trainer_lib

    hp = tiny_hp.replace(Tokens={"Use_Phoneme": True})
    models = trainer_lib.build_models(hp)
    seq = encode_text("the quick brown fox", hp)
    B, S, T = 2, len(seq), 16
    rng = np.random.default_rng(0)
    batch = {
        "tokens": np.stack([seq, seq]),
        "token_lengths": np.full((B,), S, np.int32),
        "mels": rng.random((B, T, hp.Sound.Mel_Dim), np.float32),
        "mel_lengths": np.full((B,), T, np.int32),
        "ref_mels": rng.random(
            (B, hp.Speaker_Embedding.GE2E.Window_Length, hp.Sound.Mel_Dim),
            np.float32,
        ),
        "spects": rng.random((B, T, hp.Sound.Spectrogram_Dim), np.float32),
        "speaker_ids": np.zeros((B,), np.int32),
    }
    state = trainer_lib.init_state(hp, models, jax.random.PRNGKey(0), batch)
    emb = state.params["tacotron"]["encoder"]["embedding"]["embedding"]
    assert emb.shape[0] == vocab_size(hp)
    step = jax.jit(trainer_lib.make_train_step(hp, models))
    _, metrics = step(state, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))
