"""Text-to-speech with the two-level AR codec TTS (reference
example/src/tts_simple.rs).

Usage: python examples/tts_simple.py --model-path /path/to/csm --out out.wav
"""

import argparse

import numpy as np

from crane_tpu.audio.pcm import save_wav
from crane_tpu.models.csm_tts import load_csm
from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

ap = argparse.ArgumentParser()
ap.add_argument("--model-path", required=True)
ap.add_argument("--text", default="Hello from the TPU!")
ap.add_argument("--out", default="out.wav")
args = ap.parse_args()

model = load_csm(args.model_path, with_codec=True)
tok = AutoTokenizer.from_pretrained(args.model_path)
wav = model.generate_speech(tok.encode(args.text))
save_wav(args.out, np.clip(wav, -1, 1), model.codec.config.sampling_rate)
print(f"wrote {args.out} ({len(wav)} samples)")
