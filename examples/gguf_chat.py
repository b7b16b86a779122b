"""Chat from a quantized GGUF file with the embedded tokenizer (reference
GGUF path, qwen3_5/model.rs:146-309 + autotokenizer.rs:162-230).

Usage: python examples/gguf_chat.py --gguf model-q4_0.gguf
"""

import argparse

from crane_tpu.generation.config import GenerationConfig
from crane_tpu.loaders.gguf_model import from_gguf
from crane_tpu.sdk.client import LlmClient

ap = argparse.ArgumentParser()
ap.add_argument("--gguf", required=True)
ap.add_argument("--prompt", default="Hello!")
args = ap.parse_args()

lm = from_gguf(args.gguf, keep_quant=True)
client = LlmClient(lm)
print(client.chat([{"role": "user", "content": args.prompt}],
                  GenerationConfig(max_new_tokens=256, do_sample=True,
                                   temperature=0.7, report_speed=True)))
