"""Voice cloning: synthesize text in the voice of a reference recording
(reference example/src/tts_voice_clone.rs — codec-frame in-context audio
conditioning, qwen3_tts/model.rs:389-480).

The checkpoint's config selects the family:
  Qwen3-TTS base: ECAPA speaker x-vector + speech-tokenizer Mimi ENCODER
      turn the reference WAV into ICL codec codes (needs --ref-text, the
      transcript of the reference audio).
  CSM: codec-frame audio context through the Mimi codec.

Usage: python examples/tts_voice_clone.py --model-path /path/to/tts \
           --ref-wav speaker.wav [--ref-text "what the speaker says"] \
           --text "Hello in your voice" --out out.wav
"""

import argparse

import numpy as np

from crane_tpu.audio.pcm import load_wav_f32, save_wav
from crane_tpu.generation.config import SpeechOptions
from crane_tpu.models.auto import load_hf_config
from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

ap = argparse.ArgumentParser()
ap.add_argument("--model-path", required=True)
ap.add_argument("--ref-wav", required=True, help="reference speaker audio")
ap.add_argument("--ref-text", default="", help="transcript of the reference audio (Qwen3-TTS ICL)")
ap.add_argument("--text", default="Hello from the TPU, in a cloned voice!")
ap.add_argument("--language", default=None)
ap.add_argument("--out", default="cloned.wav")
args = ap.parse_args()

hf = load_hf_config(args.model_path)
opts = SpeechOptions(language=args.language)
if "talker_config" in hf or hf.get("model_type") == "qwen3_tts":
    from crane_tpu.models.qwen3_tts import load_qwen3_tts
    from crane_tpu.sdk.audio import Qwen3Tts

    tts = Qwen3Tts(load_qwen3_tts(args.model_path))
    rate = tts.audio_info().sample_rate
    ref, _ = load_wav_f32(args.ref_wav, target_rate=rate)
    wav = tts.generate_voice_clone(args.text, ref, args.ref_text, opts)
else:
    from crane_tpu.models.csm_tts import load_csm
    from crane_tpu.sdk.audio import CsmTts

    tts = CsmTts(load_csm(args.model_path, with_codec=True),
                 tokenizer=AutoTokenizer.from_pretrained(args.model_path))
    rate = tts.audio_info().sample_rate
    ref, _ = load_wav_f32(args.ref_wav, target_rate=rate)
    wav = tts.generate_voice_clone(args.text, ref, opts)
save_wav(args.out, np.clip(wav, -1, 1), rate)
print(f"wrote {args.out} ({len(wav)} samples @ {rate} Hz)")
