"""Voxtral TTS: AR semantic tokens + flow-matched acoustic codes -> 24 kHz
WAV (reference example/src/voxtral_tts_simple.rs).

Usage: python examples/voxtral_tts_simple.py --model-path /path/to/voxtral \
           --text "hello" --voice alice --out out.wav
The checkpoint dir is the released layout: params.json + tekken.json +
consolidated.safetensors + voice_embedding/*.pt (reference model.rs:353-360).
"""

import argparse

import numpy as np

from crane_tpu.audio.pcm import save_wav
from crane_tpu.models.voxtral_tts import load_voxtral_tts

ap = argparse.ArgumentParser()
ap.add_argument("--model-path", required=True)
ap.add_argument("--text", default="Hello from the TPU!")
ap.add_argument("--voice", default=None)
ap.add_argument("--out", default="out.wav")
ap.add_argument("--max-frames", type=int, default=250)  # 20 s at 12.5 Hz
args = ap.parse_args()

tts, tok = load_voxtral_tts(args.model_path)
if tok is not None:
    wav, sr = tts.generate_speech(args.text, voice=args.voice,
                                  max_frames=args.max_frames)
else:  # no tekken.json: fall back to any HF tokenizer in the directory
    from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

    hf_tok = AutoTokenizer.from_pretrained(args.model_path)
    wav, sr = tts.generate(hf_tok.encode(args.text), voice=args.voice,
                           max_frames=args.max_frames)
save_wav(args.out, np.clip(wav, -1, 1), sr)
print(f"wrote {args.out} ({len(wav)} samples @ {sr} Hz)")
