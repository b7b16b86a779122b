"""Speech-to-text with Moonshine (reference example/src/asr_simple.rs).

Usage: python examples/asr_simple.py --model-path /path/to/moonshine --wav audio.wav
"""

import argparse

from crane_tpu.audio.pcm import load_wav_f32
from crane_tpu.models.moonshine import load_moonshine
from crane_tpu.models.silero_vad import Vad, VadConfig, energy_vad

ap = argparse.ArgumentParser()
ap.add_argument("--model-path", required=True)
ap.add_argument("--wav", required=True)
ap.add_argument("--vad", action="store_true", help="segment with VAD first")
args = ap.parse_args()

model = load_moonshine(args.model_path)
samples, _ = load_wav_f32(args.wav, target_rate=16000)

if args.vad:
    vad = Vad(VadConfig(), model=energy_vad())
    for seg in vad.segment_audio(samples):
        text = model.transcribe(samples[seg.start : seg.end])
        print(f"[{seg.start / 16000:.2f}-{seg.end / 16000:.2f}s] {text}")
else:
    print(model.transcribe(samples))
