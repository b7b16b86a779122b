"""Kokoro-style TTS: text -> G2P -> style-conditioned synthesis -> WAV
(reference example kokoro path).

Usage: python examples/kokoro_tts_simple.py --model-path /path/to/kokoro \
           --text "Hello world" --voice af_heart [--language de] --out out.wav
The model dir needs tokenizer.json (phoneme vocab) and voices/*.bin. With
the released onnx/model.onnx present this synthesizes with the real
Kokoro-82M graph (crane_tpu.onnx evaluator); otherwise it falls back to the
random-init native net (pipeline smoke test).
"""

import argparse
import glob
import os

import numpy as np

from crane_tpu.audio.pcm import save_wav
from crane_tpu.models.kokoro_tts import (
    KokoroNetConfig,
    KokoroSynthesizer,
    KokoroTts,
    load_voice_bin,
    parse_vocab,
)
from crane_tpu.text.g2p import MultilingualPhonemizer

ap = argparse.ArgumentParser()
ap.add_argument("--model-path", required=True)
ap.add_argument("--text", default="Hello world")
ap.add_argument("--voice", default=None)
ap.add_argument("--language", default="en_us", help="en_us or de (German rules engine)")
ap.add_argument("--speed", type=float, default=1.0)
ap.add_argument("--out", default="out.wav")
args = ap.parse_args()

has_onnx = glob.glob(os.path.join(args.model_path, "onnx", "*.onnx")) or \
    glob.glob(os.path.join(args.model_path, "*.onnx"))
if has_onnx:
    from crane_tpu.models.kokoro_tts import load_kokoro_onnx

    tts = load_kokoro_onnx(args.model_path, phonemizer=MultilingualPhonemizer())
else:
    vocab = parse_vocab(os.path.join(args.model_path, "tokenizer.json"))
    voices = {
        os.path.splitext(os.path.basename(p))[0]: load_voice_bin(p)
        for p in glob.glob(os.path.join(args.model_path, "voices", "*.bin"))
    }
    synth = KokoroSynthesizer(KokoroNetConfig(vocab_size=max(vocab.values()) + 1))
    tts = KokoroTts(vocab, voices, synth, phonemizer=MultilingualPhonemizer())
wav, sr = tts.generate_speech(args.text, language=args.language,
                              voice=args.voice, speed=args.speed)
save_wav(args.out, np.clip(wav, -1, 1), sr)
print(f"wrote {args.out} ({len(wav)} samples @ {sr} Hz)")
