"""Voice cloning: synthesize text in the voice of a reference recording
(reference example/src/tts_voice_clone.rs — codec-frame in-context audio
conditioning, qwen3_tts/model.rs:389-480).

Usage: python examples/tts_voice_clone.py --model-path /path/to/csm \
           --ref-wav speaker.wav --text "Hello in your voice" --out out.wav
"""

import argparse

import numpy as np

from crane_tpu.audio.pcm import load_wav_f32, save_wav
from crane_tpu.models.csm_tts import load_csm
from crane_tpu.sdk.audio import CsmTts
from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

ap = argparse.ArgumentParser()
ap.add_argument("--model-path", required=True)
ap.add_argument("--ref-wav", required=True, help="reference speaker audio")
ap.add_argument("--text", default="Hello from the TPU, in a cloned voice!")
ap.add_argument("--out", default="cloned.wav")
args = ap.parse_args()

model = load_csm(args.model_path, with_codec=True)
tts = CsmTts(model, tokenizer=AutoTokenizer.from_pretrained(args.model_path))
rate = tts.audio_info().sample_rate
ref, _ = load_wav_f32(args.ref_wav, target_rate=rate)
wav = tts.generate_voice_clone(args.text, ref)
save_wav(args.out, np.clip(wav, -1, 1), rate)
print(f"wrote {args.out} ({len(wav)} samples @ {rate} Hz)")
