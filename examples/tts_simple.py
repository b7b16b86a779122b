"""Text-to-speech (reference example/src/{tts_simple,tts_custom_voice}.rs).

Usage: python examples/tts_simple.py --model-path /path/to/tts \
           [--voice Vivian] [--text ...] --out out.wav
The checkpoint's config selects the family: Qwen3-TTS (Talker +
CodePredictor + RVQGAN, named voices) or CSM + Mimi codec.
"""

import argparse

import numpy as np

from crane_tpu.audio.pcm import save_wav
from crane_tpu.generation.config import SpeechOptions
from crane_tpu.models.auto import load_hf_config
from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

ap = argparse.ArgumentParser()
ap.add_argument("--model-path", required=True)
ap.add_argument("--text", default="Hello from the TPU!")
ap.add_argument("--voice", default=None, help="named speaker (Qwen3-TTS)")
ap.add_argument("--language", default=None)
ap.add_argument("--out", default="out.wav")
args = ap.parse_args()

hf = load_hf_config(args.model_path)
opts = SpeechOptions(voice=args.voice, language=args.language)
if "talker_config" in hf or hf.get("model_type") == "qwen3_tts":
    from crane_tpu.models.qwen3_tts import load_qwen3_tts
    from crane_tpu.sdk.audio import Qwen3Tts

    tts = Qwen3Tts(load_qwen3_tts(args.model_path))
else:
    from crane_tpu.models.csm_tts import load_csm
    from crane_tpu.sdk.audio import CsmTts

    tts = CsmTts(load_csm(args.model_path, with_codec=True),
                 tokenizer=AutoTokenizer.from_pretrained(args.model_path))
wav = tts.generate_speech(args.text, opts)
sr = tts.audio_info().sample_rate
save_wav(args.out, np.clip(wav, -1, 1), sr)
print(f"wrote {args.out} ({len(wav)} samples @ {sr} Hz)")
