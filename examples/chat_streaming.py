"""Streaming chat: print deltas as they decode (reference
example/src/chat_streaming.rs — AsyncTextStreamer over a worker thread).

Usage: python examples/chat_streaming.py --model-path /path/to/Qwen3-0.6B
"""

import argparse
import sys

from crane_tpu.generation.config import GenerationConfig
from crane_tpu.sdk.client import LlmClient

ap = argparse.ArgumentParser()
ap.add_argument("--model-path", required=True)
ap.add_argument("--prompt", default="Write a haiku about oceans.")
ap.add_argument("--max-new-tokens", type=int, default=256)
args = ap.parse_args()

client = LlmClient.from_pretrained(args.model_path)
for delta in client.chat_stream(
    [{"role": "user", "content": args.prompt}],
    GenerationConfig(max_new_tokens=args.max_new_tokens, do_sample=True,
                     temperature=0.7, top_p=0.95, top_k=40),
):
    sys.stdout.write(delta)
    sys.stdout.flush()
print()
