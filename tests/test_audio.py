"""Audio utilities: WAV codec round trips + mel-frontend parity vs Whisper."""

import numpy as np
import pytest

import jax.numpy as jnp

from crane_tpu.audio.mel import MelConfig, log_mel_spectrogram, mel_filter_bank
from crane_tpu.audio.pcm import (
    decode_wav,
    encode_wav,
    f32_to_i16,
    i16_to_f32,
    load_wav_f32,
    resample,
    save_wav,
)


def tone(n=16000, sr=16000, f=440.0):
    t = np.arange(n, dtype=np.float32) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


class TestPCM:
    def test_wav_roundtrip_pcm16(self):
        x = tone()
        y, rate = decode_wav(encode_wav(x, 16000))
        assert rate == 16000
        np.testing.assert_allclose(y, x, atol=1.0 / 32000)

    def test_wav_roundtrip_f32(self):
        x = tone()
        y, rate = decode_wav(encode_wav(x, 22050, float32=True))
        assert rate == 22050
        np.testing.assert_array_equal(y, x)

    def test_stereo_downmix(self):
        x = np.stack([tone(), np.zeros(16000, np.float32)], axis=1)
        y, _ = decode_wav(encode_wav(x, 16000))
        np.testing.assert_allclose(y, tone() / 2, atol=1e-3)

    def test_file_io(self, tmp_path):
        x = tone()
        p = str(tmp_path / "t.wav")
        save_wav(p, x, 16000)
        y, rate = load_wav_f32(p, target_rate=8000)
        assert rate == 8000 and len(y) == 8000

    def test_resample_preserves_tone(self):
        x = tone(sr=16000, f=100.0)
        y = resample(x, 16000, 8000)
        assert len(y) == 8000
        # 100 Hz tone survives 2x downsampling
        spec = np.abs(np.fft.rfft(y))
        assert spec.argmax() == 100

    def test_i16_conversions(self):
        x = np.asarray([-1.0, 0.0, 0.999], np.float32)
        np.testing.assert_allclose(i16_to_f32(f32_to_i16(x)), x, atol=1e-3)

    def test_bad_wav_rejected(self):
        with pytest.raises(ValueError):
            decode_wav(b"not a wav file at all")


class TestMel:
    def test_filterbank_matches_transformers(self):
        ta = pytest.importorskip("transformers.audio_utils")
        ref = ta.mel_filter_bank(
            num_frequency_bins=201, num_mel_filters=128, min_frequency=0.0,
            max_frequency=8000.0, sampling_rate=16000, norm="slaney",
            mel_scale="slaney",
        )
        got = mel_filter_bank(201, 128, 0.0, 8000.0, 16000)
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_whisper_parity(self):
        transformers = pytest.importorskip("transformers")
        fe = transformers.WhisperFeatureExtractor(feature_size=128)
        x = tone(n=16000 * 2)
        ref = fe(
            [x], sampling_rate=16000, return_tensors="np",
            padding=False, do_normalize=False,
        )["input_features"][0]
        cfg = MelConfig(n_mels=128)
        got = np.asarray(log_mel_spectrogram(cfg, jnp.asarray(x)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_ln_mode_shape(self):
        cfg = MelConfig(n_mels=80, log_mode="ln")
        out = np.asarray(log_mel_spectrogram(cfg, jnp.asarray(tone())))
        assert out.shape[0] == 80
        assert np.isfinite(out).all()
