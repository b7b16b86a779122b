"""Audio SDK: Tts / Asr protocols + adapters (reference crane/src/audio/
{tts.rs,asr.rs}: audio_info(), generate_speech(...), transcribe(...),
streaming variants; crane-serve holds trait objects of these)."""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Protocol

import numpy as np

from crane_tpu.generation.config import SpeechOptions, TranscribeOptions


@dataclasses.dataclass
class AudioInfo:
    sample_rate: int
    channels: int = 1


@dataclasses.dataclass
class Transcript:
    text: str
    tokens: list[int] = dataclasses.field(default_factory=list)


class Tts(Protocol):
    def audio_info(self) -> AudioInfo: ...

    def generate_speech(
        self, text: str, options: SpeechOptions | None = None
    ) -> np.ndarray: ...

    def supports_voice_cloning(self) -> bool: ...


class Asr(Protocol):
    def input_sample_rate(self) -> int: ...

    def transcribe(
        self, samples: np.ndarray, options: TranscribeOptions | None = None
    ) -> Transcript: ...


class CsmTts:
    """Tts adapter over the two-level AR codec TTS."""

    def __init__(self, model, tokenizer=None, *, max_frames: int = 1000):
        self.model = model
        self.tokenizer = tokenizer or model.__dict__.get("tokenizer")
        self.max_frames = max_frames

    def audio_info(self) -> AudioInfo:
        sr = 24000
        if self.model.codec is not None:
            sr = self.model.codec.config.sampling_rate
        return AudioInfo(sample_rate=sr)

    def supports_voice_cloning(self) -> bool:
        return self.model.codec is not None

    def generate_speech(self, text: str, options: SpeechOptions | None = None) -> np.ndarray:
        options = options or SpeechOptions()
        if self.tokenizer is None:
            raise ValueError("TTS adapter needs a text tokenizer")
        ids = self.tokenizer.encode(text)
        max_frames = min(self.max_frames, options.max_new_tokens)
        return self.model.generate_speech(ids, max_frames=max_frames)

    def generate_voice_clone(
        self,
        text: str,
        reference_audio: np.ndarray,
        options: SpeechOptions | None = None,
    ) -> np.ndarray:
        """Clone the voice of ``reference_audio`` (codec-frame ICL context —
        reference generate_voice_clone, qwen3_tts/model.rs:389-480)."""
        options = options or SpeechOptions()
        ids = self.tokenizer.encode(text)
        codes = self.model.generate_codes(
            ids, audio_context=np.asarray(reference_audio, np.float32),
            max_frames=min(self.max_frames, options.max_new_tokens),
        )
        if codes.shape[0] == 0:
            return np.zeros((0,), np.float32)
        return self.model.codec.chunked_decode(codes.T[None], chunk=300, overlap=25)[0]

    def generate_speech_stream(
        self, text: str, options: SpeechOptions | None = None
    ) -> Iterator[np.ndarray]:
        # default single-shot stream (reference TtsStream::once)
        yield self.generate_speech(text, options)


class MoonshineAsr:
    """Asr adapter over the Moonshine encoder-decoder."""

    def __init__(self, model):
        self.model = model

    def input_sample_rate(self) -> int:
        return 16000

    def transcribe(
        self, samples: np.ndarray, options: TranscribeOptions | None = None
    ) -> Transcript:
        ids = self.model.transcribe_ids(samples, options)
        text = self.model.tokenizer.decode(ids) if self.model.tokenizer else ""
        return Transcript(text=text, tokens=ids)
