"""Voice activity detection: streaming VAD with segment extraction.

Reference behavior (/root/reference/crane-core/src/models/silero_vad/
model.rs): the reference runs the Silero conv-RNN via its ONNX evaluator and
drives a chunked 512/256-sample streaming state machine (`Vad::segment_audio`)
with `VadConfig` thresholds (threshold + hysteresis, min speech/silence
durations, speech padding) producing `Segment`s (model.rs:35-90, 372-440,
703-840; 8 k/16 k sample rates :18-22).

TPU-native design: the probability model is a small native JAX conv+LSTM
(`VadModel`, SURVEY.md §7: tiny graphs are ported natively rather than
evaluated through ONNX); the state machine is pure host Python (it is
per-chunk control flow, not tensor math). The state machine accepts ANY
``prob_fn(chunk, state) -> (p, state)``; `load_silero_onnx` runs the
RELEASED ``onnx-community/silero-vad`` checkpoint through the in-tree ONNX
evaluator (`OnnxVadModel`), exactly as the reference does (model.rs:28-29,
315-317), while `VadModel` remains the native synthetic-weight path.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class VadConfig:
    sample_rate: int = 16000  # 8000 or 16000
    threshold: float = 0.5
    neg_threshold_offset: float = 0.15  # hysteresis: neg = threshold - offset
    min_speech_duration_ms: int = 250
    min_silence_duration_ms: int = 100
    speech_pad_ms: int = 30
    window_size_samples: int = 512  # 256 for 8 kHz

    def __post_init__(self):
        if self.sample_rate not in (8000, 16000):
            raise ValueError("sample_rate must be 8000 or 16000")
        if self.sample_rate == 8000 and self.window_size_samples == 512:
            self.window_size_samples = 256

    @property
    def neg_threshold(self) -> float:
        return self.threshold - self.neg_threshold_offset

    def ms_to_samples(self, ms: int) -> int:
        return ms * self.sample_rate // 1000


@dataclasses.dataclass
class Segment:
    start: int  # sample index
    end: int

    def duration_s(self, sample_rate: int) -> float:
        return (self.end - self.start) / sample_rate


# -- native conv+LSTM probability model --------------------------------------


@dataclasses.dataclass(frozen=True)
class VadModelConfig:
    window: int = 512
    n_fft: int = 256
    conv_channels: tuple = (16, 32, 32, 64)
    lstm_hidden: int = 64


def init_vad_params(cfg: VadModelConfig, seed: int = 0) -> dict:
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 16)
    n_freq = cfg.n_fft // 2 + 1
    params, cin = {"convs": []}, n_freq
    for i, cout in enumerate(cfg.conv_channels):
        params["convs"].append(
            {
                "w": jax.random.normal(ks[i], (3, cin, cout)) * (3 * cin) ** -0.5,
                "b": jnp.zeros((cout,)),
            }
        )
        cin = cout
    h = cfg.lstm_hidden
    params["lstm"] = {
        "wi": jax.random.normal(ks[8], (cin, 4 * h)) * cin ** -0.5,
        "wh": jax.random.normal(ks[9], (h, 4 * h)) * h ** -0.5,
        "b": jnp.zeros((4 * h,)),
    }
    params["head"] = {
        "w": jax.random.normal(ks[10], (h, 1)) * h ** -0.5,
        "b": jnp.zeros((1,)),
    }
    return params


def _lstm_cell(p, x, state):
    h, c = state
    gates = x @ p["wi"] + h @ p["wh"] + p["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, (h, c)


def vad_forward(cfg: VadModelConfig, params: dict, chunk: jax.Array, state):
    """chunk ``[window]`` -> (speech prob scalar, new lstm state)."""
    n = cfg.n_fft
    frames = chunk.reshape(-1, n // 2)
    # overlapping frames of n with hop n/2
    frames = jnp.concatenate([frames[:-1], frames[1:]], axis=-1)
    win = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(n) / n)
    spec = jnp.abs(jnp.fft.rfft(frames * win, axis=-1))  # [T, n_freq]
    x = jnp.log1p(spec)[None]
    for cp in params["convs"]:
        x = jax.lax.conv_general_dilated(
            x, cp["w"], (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
        )
        x = jax.nn.relu(x + cp["b"])
    feat = x[0].mean(axis=0)  # [C]
    h, state = _lstm_cell(params["lstm"], feat, state)
    p = jax.nn.sigmoid(h @ params["head"]["w"] + params["head"]["b"])[0]
    return p, state


class VadModel:
    def __init__(self, cfg: VadModelConfig | None = None, params: dict | None = None):
        self.cfg = cfg or VadModelConfig()
        self.params = params or init_vad_params(self.cfg)
        self._fn = jax.jit(lambda c, s: vad_forward(self.cfg, self.params, c, s))

    def initial_state(self):
        h = self.cfg.lstm_hidden
        return (jnp.zeros((h,)), jnp.zeros((h,)))

    def __call__(self, chunk: np.ndarray, state):
        p, state = self._fn(jnp.asarray(chunk, jnp.float32), state)
        return float(p), state


def energy_vad(scale: float = 20.0) -> Callable:
    """Synthetic probability model: sigmoid of RMS energy (test oracle)."""

    def fn(chunk, state):
        rms = float(np.sqrt(np.mean(np.square(np.asarray(chunk, np.float64)))))
        return 1.0 / (1.0 + np.exp(-scale * (rms - 0.1))), state

    return fn


# -- released-checkpoint path (ONNX) -----------------------------------------


class OnnxVadModel:
    """Probability model over the released Silero VAD ONNX graph, evaluated
    by ``crane_tpu.onnx`` (reference model.rs:527-585): per chunk the
    previous chunk's tail (context, 64 samples @16 kHz / 32 @8 kHz) is
    prepended, so the graph sees ``input`` ``[1, context+window]``, plus
    ``sr`` (int64 scalar) and the recurrent ``state`` ``[2, 1, 128]``; the
    graph's first output is the speech probability, the second the next
    state (output order, not names — model.rs:558-576)."""

    def __init__(self, session, sample_rate: int = 16000, state_dim: int | None = None):
        if sample_rate not in (8000, 16000):
            raise ValueError(f"unsupported sample rate {sample_rate}")
        self.session = session
        self.sample_rate = sample_rate
        self.context_size = 64 if sample_rate == 16000 else 32
        ins = list(session.input_names)
        if len(ins) != 3:
            raise ValueError(f"expected 3 graph inputs (input, sr, state), got {ins}")
        self.in_input, self.in_sr, self.in_state = ins
        if state_dim is None:
            # released graph declares state [2, B, 128]; trust its spec
            spec = session.model.graph.input_specs.get(self.in_state)
            state_dim = int(spec[1][-1]) if spec and spec[1][-1] > 0 else 128
        self.state_dim = state_dim

    def initial_state(self):
        return (
            np.zeros((2, 1, self.state_dim), np.float32),
            np.zeros((1, self.context_size), np.float32),
        )

    def __call__(self, chunk: np.ndarray, state):
        st, ctx = state
        x = np.concatenate([ctx, np.asarray(chunk, np.float32)[None]], axis=1)
        out = self.session.run({
            self.in_input: x,
            self.in_sr: np.asarray(self.sample_rate, np.int64),
            self.in_state: st,
        })
        names = self.session.output_names
        prob = float(np.asarray(out[names[0]]).reshape(-1)[0])
        new_state = np.asarray(out[names[1]], np.float32)
        return prob, (new_state, x[:, -self.context_size :])


def load_silero_onnx(path: str, sample_rate: int = 16000) -> OnnxVadModel:
    """Load a released Silero VAD ``model.onnx`` (onnx-community/silero-vad)
    as a ``Vad``-compatible probability model."""
    from crane_tpu.onnx import Session, read_file

    return OnnxVadModel(Session(read_file(path)), sample_rate)


# -- streaming state machine (reference Vad::segment_audio) ------------------


class Vad:
    def __init__(self, config: VadConfig | None = None, model: Optional[Callable] = None):
        self.config = config or VadConfig()
        self.model = model or VadModel()
        self.reset()

    def reset(self):
        self.state = self.model.initial_state() if hasattr(self.model, "initial_state") else None
        self.triggered = False
        self.current_start = 0
        self.temp_end = 0
        self.pos = 0
        self.segments: list[Segment] = []

    def process_chunk(self, chunk: np.ndarray) -> Optional[Segment]:
        """Feed one window; returns a completed Segment when one closes."""
        cfg = self.config
        p, self.state = self.model(chunk, self.state)
        done = None
        if p >= cfg.threshold:
            if not self.triggered:
                self.triggered = True
                self.current_start = max(0, self.pos - cfg.ms_to_samples(cfg.speech_pad_ms))
            self.temp_end = 0
        elif p < cfg.neg_threshold and self.triggered:
            if self.temp_end == 0:
                self.temp_end = self.pos + len(chunk)
            elif self.pos + len(chunk) - self.temp_end >= cfg.ms_to_samples(cfg.min_silence_duration_ms):
                end = self.temp_end + cfg.ms_to_samples(cfg.speech_pad_ms)
                seg = Segment(self.current_start, end)
                if seg.end - seg.start >= cfg.ms_to_samples(cfg.min_speech_duration_ms):
                    self.segments.append(seg)
                    done = seg
                self.triggered = False
                self.temp_end = 0
        self.pos += len(chunk)
        return done

    def flush(self, total_samples: int | None = None) -> Optional[Segment]:
        """Close any in-flight segment at end of stream. ``total_samples``
        clamps the end so zero-padded tail windows can't push it past the
        real audio (and the speech_pad applies as it does mid-stream)."""
        if self.triggered:
            end = self.temp_end if self.temp_end else self.pos
            end += self.config.ms_to_samples(self.config.speech_pad_ms)
            if total_samples is not None:
                end = min(end, total_samples)
            seg = Segment(self.current_start, end)
            self.triggered = False
            if seg.end - seg.start >= self.config.ms_to_samples(
                self.config.min_speech_duration_ms
            ):
                self.segments.append(seg)
                return seg
        return None

    def segment_audio(self, audio: np.ndarray) -> list[Segment]:
        """Whole-file segmentation: chunk, stream, flush."""
        self.reset()
        w = self.config.window_size_samples
        audio = np.asarray(audio, np.float32)
        for i in range(0, len(audio) - w + 1, w):
            self.process_chunk(audio[i : i + w])
        tail = len(audio) % w
        if tail:
            self.process_chunk(np.pad(audio[len(audio) - tail :], (0, w - tail)))
        self.flush(total_samples=len(audio))
        # padded ends from process_chunk are clamped to the real audio too
        self.segments = [
            Segment(s.start, min(s.end, len(audio))) for s in self.segments
        ]
        return self.segments
