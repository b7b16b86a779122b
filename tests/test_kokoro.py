"""Kokoro TTS pipeline tests (reference kokoro_tts/): IPA normalization,
chunking, style row selection, vocab/voice parsing, native synthesis net."""

import json

import numpy as np
import pytest

from crane_tpu.models.kokoro_tts import (
    SAMPLE_RATE,
    STYLE_DIM,
    KokoroIpaNormalizer,
    KokoroNetConfig,
    KokoroSynthesizer,
    KokoroTts,
    chunk_phonemes,
    load_voice_bin,
    parse_vocab,
    style_row_index,
)

VOCAB = {c: i for i, c in enumerate("$;:,.!? AIOQWYabcdefhijklmnoprstuvwzɹɜəʃʒʧʤɡ")}


class TestNormalizer:
    def test_diphthongs_collapse_to_single_codepoints(self):
        n = KokoroIpaNormalizer("en_us", VOCAB)
        assert n.normalize("haʊ eɪ aɪ ɔɪ oʊ əʊ") == "hW A I Y O Q"

    def test_affricates_with_and_without_tie_bar(self):
        n = KokoroIpaNormalizer("en_us", VOCAB)
        assert n.normalize("t͡ʃiz") == "ʧiz"
        assert n.normalize("tʃiz") == "ʧiz"
        assert n.normalize("d͡ʒʌmp") == "ʤmp"  # ʌ not in test vocab -> dropped

    def test_english_rhotic_expansions(self):
        n = KokoroIpaNormalizer("en_us", VOCAB)
        assert n.normalize("bɝd") == "bɜɹd"
        assert n.normalize("fɚ") == "fəɹ"
        # non-English: rhotics are not expanded, and the raw char is dropped
        n_de = KokoroIpaNormalizer("de", VOCAB)
        assert n_de.normalize("bɝd") == "bd"

    def test_out_of_vocab_codepoints_dropped(self):
        n = KokoroIpaNormalizer("en_us", VOCAB)
        assert n.normalize("abéc") == "abc"


class TestChunking:
    def test_short_input_single_chunk(self):
        assert chunk_phonemes("  hello world  ", 100) == ["hello world"]

    def test_cut_at_last_space_in_window(self):
        chunks = chunk_phonemes("aaa bbb ccc", 7)
        assert chunks == ["aaa bbb", "ccc"]

    def test_hard_cut_when_no_space(self):
        chunks = chunk_phonemes("abcdefghij", 4)
        assert chunks == ["abcd", "efgh", "ij"]

    def test_empty_input(self):
        assert chunk_phonemes("   ", 10) == []

    def test_every_chunk_fits(self):
        text = " ".join(["syllable"] * 200)
        for c in chunk_phonemes(text, 50):
            assert len(c) <= 50 and c == c.strip()


class TestStyleRows:
    def test_row_is_length_indexed_and_clamped(self):
        assert style_row_index(1, 510) == 0
        assert style_row_index(12, 510) == 11
        assert style_row_index(9999, 510) == 509
        assert style_row_index(0, 510) == 0  # max(1)


class TestParsers:
    def test_parse_vocab(self, tmp_path):
        p = tmp_path / "tokenizer.json"
        p.write_text(json.dumps({"model": {"vocab": {"$": 0, "a": 43, "ʧ": 90}}}))
        v = parse_vocab(str(p))
        assert v == {"$": 0, "a": 43, "ʧ": 90}

    def test_parse_vocab_rejects_multichar_keys(self, tmp_path):
        p = tmp_path / "tokenizer.json"
        p.write_text(json.dumps({"model": {"vocab": {"ab": 1}}}))
        with pytest.raises(ValueError):
            parse_vocab(str(p))

    def test_load_voice_bin(self, tmp_path):
        p = tmp_path / "af_test.bin"
        np.arange(3 * STYLE_DIM, dtype="<f4").tofile(p)
        v = load_voice_bin(str(p))
        assert v.shape == (3, STYLE_DIM)
        np.testing.assert_allclose(v[1, 0], STYLE_DIM)

    def test_load_voice_bin_rejects_bad_size(self, tmp_path):
        p = tmp_path / "bad.bin"
        np.zeros(STYLE_DIM + 1, dtype="<f4").tofile(p)
        with pytest.raises(ValueError):
            load_voice_bin(str(p))


class TestSynthesizer:
    def setup_method(self):
        self.cfg = KokoroNetConfig(vocab_size=64, dim=16, hop=40, max_duration=8)
        self.synth = KokoroSynthesizer(self.cfg, seed=0)

    def test_waveform_length_is_frame_multiple(self):
        rng = np.random.default_rng(0)
        wav = self.synth(np.arange(10), rng.standard_normal(STYLE_DIM), 1.0)
        assert wav.shape[0] % self.cfg.hop == 0
        assert wav.shape[0] >= 10 * self.cfg.hop  # >= 1 frame per phoneme
        assert np.isfinite(wav).all() and np.abs(wav).max() <= 1.0

    def test_speed_shortens_output(self):
        rng = np.random.default_rng(1)
        style = rng.standard_normal(STYLE_DIM)
        ids = np.arange(20)
        slow = self.synth(ids, style, 0.5)
        fast = self.synth(ids, style, 2.0)
        assert fast.shape[0] < slow.shape[0]

    def test_style_changes_output(self):
        rng = np.random.default_rng(2)
        ids = np.arange(8)
        a = self.synth(ids, rng.standard_normal(STYLE_DIM), 1.0)
        b = self.synth(ids, rng.standard_normal(STYLE_DIM), 1.0)
        assert a.shape != b.shape or np.abs(a - b).max() > 1e-6

    def test_deterministic(self):
        rng = np.random.default_rng(3)
        style = rng.standard_normal(STYLE_DIM)
        a = self.synth(np.arange(6), style, 1.0)
        b = self.synth(np.arange(6), style, 1.0)
        np.testing.assert_array_equal(a, b)


class TestPipeline:
    def _tts(self):
        cfg = KokoroNetConfig(vocab_size=len(VOCAB) + 4, dim=16, hop=40, max_duration=6)
        voices = {
            "af_heart": np.random.default_rng(0).standard_normal((510, STYLE_DIM)).astype(np.float32),
            "bm_alt": np.random.default_rng(1).standard_normal((510, STYLE_DIM)).astype(np.float32),
        }
        return KokoroTts(VOCAB, voices, KokoroSynthesizer(cfg, seed=0))

    def test_generate_from_phonemes(self):
        tts = self._tts()
        wav, sr = tts.generate_speech("həlO wɜɹld", language="en_us")
        assert sr == SAMPLE_RATE
        assert wav.dtype == np.float32 and wav.size > 0 and np.isfinite(wav).all()

    def test_voice_selection_and_error(self):
        tts = self._tts()
        a, _ = tts.generate_speech("hO", voice="af_heart")
        b, _ = tts.generate_speech("hO", voice="bm_alt")
        assert a.shape != b.shape or np.abs(a - b).max() > 1e-6
        with pytest.raises(KeyError):
            tts.generate_speech("hO", voice="nope")

    def test_pad_token_wraps_ids(self):
        tts = self._tts()
        ids = tts.phonemes_to_ids("ab")
        assert ids[0] == VOCAB["$"] and ids[-1] == VOCAB["$"]
        assert ids[1:-1] == [VOCAB["a"], VOCAB["b"]]

    def test_empty_text_raises(self):
        tts = self._tts()
        with pytest.raises(ValueError):
            tts.generate_speech("éé")  # all codepoints dropped

    def test_long_input_chunks_and_concatenates(self):
        tts = self._tts()
        phonemes = " ".join(["hOm"] * 300)  # > 510 codepoints
        wav, _ = tts.generate_speech(phonemes)
        assert wav.size > 0
