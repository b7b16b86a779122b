"""VAD tests: streaming state-machine semantics with a deterministic energy
model (the reference's VadConfig/segment behavior, silero_vad/model.rs), plus
the native conv-LSTM model's statefulness."""

import numpy as np

from crane_tpu.models.silero_vad import (
    Segment,
    Vad,
    VadConfig,
    VadModel,
    energy_vad,
)


def make_audio(pattern, sr=16000, chunk_ms=96):
    """pattern: list of (is_speech, duration_ms). Speech = loud tone."""
    out = []
    for speech, ms in pattern:
        n = sr * ms // 1000
        t = np.arange(n) / sr
        if speech:
            out.append((0.5 * np.sin(2 * np.pi * 300 * t)).astype(np.float32))
        else:
            out.append(np.zeros(n, np.float32))
    return np.concatenate(out)


def vad(**kw):
    cfg = VadConfig(**kw)
    return Vad(cfg, model=energy_vad())


class TestStateMachine:
    def test_single_utterance(self):
        audio = make_audio([(False, 500), (True, 1000), (False, 500)])
        segs = vad().segment_audio(audio)
        assert len(segs) == 1
        s = segs[0]
        # boundaries within ~2 windows + padding of the true 0.5s/1.5s marks
        assert abs(s.start - 8000) < 1500
        assert abs(s.end - 24000) < 3000

    def test_short_blip_filtered(self):
        """Speech shorter than min_speech_duration is dropped."""
        audio = make_audio([(False, 500), (True, 60), (False, 800)])
        segs = vad(min_speech_duration_ms=250).segment_audio(audio)
        assert segs == []

    def test_short_silence_bridged(self):
        """Silence shorter than min_silence does not split a segment."""
        audio = make_audio(
            [(False, 400), (True, 500), (False, 60), (True, 500), (False, 400)]
        )
        segs = vad(min_silence_duration_ms=200).segment_audio(audio)
        assert len(segs) == 1

    def test_long_silence_splits(self):
        audio = make_audio(
            [(False, 400), (True, 500), (False, 600), (True, 500), (False, 400)]
        )
        segs = vad(min_silence_duration_ms=200).segment_audio(audio)
        assert len(segs) == 2

    def test_flush_open_segment(self):
        audio = make_audio([(False, 300), (True, 700)])  # ends mid-speech
        segs = vad().segment_audio(audio)
        assert len(segs) == 1
        assert segs[0].end >= len(audio) - 16000 * 96 // 1000

    def test_8k_window(self):
        cfg = VadConfig(sample_rate=8000)
        assert cfg.window_size_samples == 256

    def test_streaming_equals_batch(self):
        audio = make_audio([(False, 400), (True, 800), (False, 500)])
        v1 = vad()
        batch = v1.segment_audio(audio)
        v2 = vad()
        v2.reset()
        w = v2.config.window_size_samples
        for i in range(0, len(audio) - w + 1, w):
            v2.process_chunk(audio[i : i + w])
        v2.flush()
        assert [(s.start, s.end) for s in batch] == [
            (s.start, s.end) for s in v2.segments
        ]


class TestNativeModel:
    def test_forward_shapes_and_state(self):
        m = VadModel()
        state = m.initial_state()
        chunk = np.random.default_rng(0).standard_normal(512).astype(np.float32)
        p1, state = m(chunk, state)
        assert 0.0 <= p1 <= 1.0
        # state evolves: same chunk gives a different prob with updated state
        p2, state = m(chunk, state)
        assert p1 != p2

    def test_with_state_machine(self):
        m = VadModel()
        v = Vad(VadConfig(), model=m)
        audio = np.zeros(512 * 6, np.float32)
        segs = v.segment_audio(audio)  # random weights: just must not crash
        assert isinstance(segs, list)
