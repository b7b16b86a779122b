"""Minimal chat (reference example/src/chat_simple.rs).

Usage: python examples/chat_simple.py --model-path /path/to/Qwen3-0.6B
"""

import argparse

from crane_tpu.generation.config import GenerationConfig
from crane_tpu.sdk.client import LlmClient

ap = argparse.ArgumentParser()
ap.add_argument("--model-path", required=True)
ap.add_argument("--prompt", default="Give me a short introduction to large language models.")
ap.add_argument("--max-new-tokens", type=int, default=256)
args = ap.parse_args()

client = LlmClient.from_pretrained(args.model_path)
reply = client.chat(
    [{"role": "user", "content": args.prompt}],
    GenerationConfig(max_new_tokens=args.max_new_tokens, do_sample=True,
                     temperature=0.7, top_p=0.95, top_k=40, report_speed=True),
)
print(reply)
