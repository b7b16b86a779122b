"""Voxtral TTS: AR semantic tokens + flow-matched acoustic codes -> 24 kHz
WAV (reference example/src/voxtral_tts_simple.rs).

Usage: python examples/voxtral_tts_simple.py --model-path /path/to/voxtral \
           --text "hello" --voice alice --out out.wav
The checkpoint dir must hold the Mistral-style safetensors and (optionally)
voice embedding .npy files; text is tokenized with any HF tokenizer in the
directory (Tekken exports to tokenizer.json).
"""

import argparse
import glob
import json
import os

import numpy as np

from crane_tpu.audio.pcm import save_wav
from crane_tpu.models.voxtral_tts import VoxtralConfig, VoxtralTts, map_voxtral_weights

ap = argparse.ArgumentParser()
ap.add_argument("--model-path", required=True)
ap.add_argument("--text", default="Hello from the TPU!")
ap.add_argument("--voice", default=None)
ap.add_argument("--out", default="out.wav")
ap.add_argument("--max-frames", type=int, default=250)  # 20 s at 12.5 Hz
args = ap.parse_args()

from crane_tpu.loaders.safetensors_loader import load_state_dict

cfg_path = os.path.join(args.model_path, "params.json")
cfg = VoxtralConfig() if not os.path.exists(cfg_path) else VoxtralConfig(
    **{k: v for k, v in json.load(open(cfg_path)).items()
       if k in VoxtralConfig.__dataclass_fields__}
)
params = map_voxtral_weights(cfg, load_state_dict(args.model_path))
voices = {
    os.path.splitext(os.path.basename(p))[0]: np.load(p)
    for p in glob.glob(os.path.join(args.model_path, "voices", "*.npy"))
}
tts = VoxtralTts(cfg, params, voices=voices)

from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

tok = AutoTokenizer.from_pretrained(args.model_path)
wav, sr = tts.generate(tok.encode(args.text), voice=args.voice,
                       max_frames=args.max_frames)
save_wav(args.out, np.clip(wav, -1, 1), sr)
print(f"wrote {args.out} ({len(wav)} samples @ {sr} Hz)")
