"""Voice activity detection over a WAV file (reference silero_vad usage:
crane-serve consumers + model.rs streaming API).

Usage: python examples/vad_simple.py --wav speech.wav \
           [--onnx /path/to/silero/model.onnx] [--sample-rate 16000] \
           [--min-silence-ms 400]

With --onnx, the released onnx-community/silero-vad checkpoint runs through
the in-tree ONNX evaluator; without it, a deterministic energy model
segments by loudness (useful for piping into ASR without the checkpoint).
"""

import argparse

from crane_tpu.audio.pcm import load_wav_f32
from crane_tpu.models.silero_vad import Vad, VadConfig, energy_vad, load_silero_onnx

ap = argparse.ArgumentParser()
ap.add_argument("--wav", required=True)
ap.add_argument("--onnx", default=None, help="released silero-vad model.onnx")
ap.add_argument("--sample-rate", type=int, default=16000)
ap.add_argument("--min-silence-ms", type=int, default=400)
ap.add_argument("--threshold", type=float, default=0.5)
args = ap.parse_args()

audio, sr = load_wav_f32(args.wav, target_rate=args.sample_rate)
model = (
    load_silero_onnx(args.onnx, sample_rate=args.sample_rate)
    if args.onnx
    else energy_vad()
)
cfg = VadConfig(
    sample_rate=args.sample_rate,
    min_silence_duration_ms=args.min_silence_ms,
    threshold=args.threshold,
)
vad = Vad(cfg, model=model)
segments = vad.segment_audio(audio)
if not segments:
    print("no speech detected")
for seg in segments:
    print(
        f"speech {seg.start / args.sample_rate:8.2f}s .. "
        f"{seg.end / args.sample_rate:8.2f}s  ({seg.duration_s(args.sample_rate):.2f}s)"
    )
