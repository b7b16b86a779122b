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


class TestOnnxCheckpointPath:
    """The released-checkpoint path (reference model.rs:28-29, 315-317,
    527-585): an ONNX graph with the EXACT onnx-community/silero-vad
    interface — input [1, context+window], sr int64, state [2,1,H] ->
    (prob, next state) — exported from torch and evaluated by
    crane_tpu.onnx, oracle-compared against the torch module."""

    H = 16

    class TinySilero:
        pass  # placeholder: real class built lazily (torch import is gated)

    @staticmethod
    def _build(tmp_path, sr=16000):
        import pytest

        torch = pytest.importorskip("torch")
        nn = torch.nn
        import torch.onnx._internal.torchscript_exporter.onnx_proto_utils as _opu

        _opu._add_onnxscript_fn = lambda b, c: b

        H = TestOnnxCheckpointPath.H

        class TinySilero(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv1d(1, 8, 9, stride=4)
                self.conv2 = nn.Conv1d(8, H, 9, stride=4)
                self.lstm = nn.LSTM(H, H, batch_first=True)
                self.fc = nn.Linear(H, 1)

            def forward(self, input, sr, state):
                x = input.unsqueeze(1)
                x = torch.relu(self.conv1(x))
                x = torch.relu(self.conv2(x)).permute(0, 2, 1)
                out, (hn, cn) = self.lstm(x, (state[0:1], state[1:2]))
                gain = (sr > 0).to(out.dtype)  # keeps sr a live graph input
                # mean over steps: every conv frame (incl. the context
                # region) contributes, so dropped-context bugs are visible
                p = torch.sigmoid(self.fc(out.mean(1))) * gain
                return p, torch.cat([hn, cn], 0)

        torch.manual_seed(7)
        m = TinySilero().eval()
        ctx = 64 if sr == 16000 else 32
        win = 512 if sr == 16000 else 256
        args = (
            torch.randn(1, ctx + win),
            torch.tensor(sr, dtype=torch.int64),
            torch.zeros(2, 1, H),
        )
        path = str(tmp_path / "vad.onnx")
        with torch.no_grad():
            torch.onnx.export(
                m, args, path, opset_version=17, dynamo=False,
                input_names=["input", "sr", "state"],
                output_names=["output", "stateN"],
            )
        return torch, m, path

    def test_probs_and_state_match_torch(self, tmp_path):
        from crane_tpu.models.silero_vad import load_silero_onnx

        torch, m, path = self._build(tmp_path)
        model = load_silero_onnx(path, sample_rate=16000)
        assert model.context_size == 64
        state = (np.zeros((2, 1, self.H), np.float32), np.zeros((1, 64), np.float32))
        rng = np.random.default_rng(3)
        t_state = torch.zeros(2, 1, self.H)
        t_ctx = torch.zeros(1, 64)
        for _ in range(5):
            chunk = rng.normal(size=512).astype(np.float32) * 0.3
            p, state = model(chunk, state)
            with torch.no_grad():
                x = torch.cat([t_ctx, torch.from_numpy(chunk)[None]], 1)
                ref_p, t_state = m(x, torch.tensor(16000), t_state)
                t_ctx = x[:, -64:]
            np.testing.assert_allclose(p, float(ref_p), rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(state[0], t_state.numpy(), rtol=1e-4, atol=1e-5)

    def test_context_threading_matters(self, tmp_path):
        """Prepending the previous chunk's tail is load-bearing: zeroed
        context yields different probabilities (guards against silently
        dropping the v5 context convention)."""
        from crane_tpu.models.silero_vad import load_silero_onnx

        _, _, path = self._build(tmp_path)
        model = load_silero_onnx(path)
        rng = np.random.default_rng(4)
        c1 = rng.normal(size=512).astype(np.float32)
        c2 = rng.normal(size=512).astype(np.float32)
        _, st = model(c1, model.initial_state())
        np.testing.assert_array_equal(st[1], c1[None, -64:])  # tail kept
        p_threaded, _ = model(c2, st)
        p_zeroctx, _ = model(c2, (st[0], np.zeros((1, 64), np.float32)))
        assert abs(p_threaded - p_zeroctx) > 1e-6

    def test_segment_audio_through_state_machine(self, tmp_path):
        from crane_tpu.models.silero_vad import Vad, VadConfig, load_silero_onnx

        _, _, path = self._build(tmp_path)
        model = load_silero_onnx(path)
        audio = np.random.default_rng(5).normal(size=512 * 8).astype(np.float32)
        v = Vad(VadConfig(), model=model)
        segs = v.segment_audio(audio)
        assert isinstance(segs, list)  # random weights: structural check only
        # state machine reset rebuilds the (state, context) pair
        v.reset()
        assert v.state[1].shape == (1, 64)
