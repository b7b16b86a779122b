"""Interactive streaming chat REPL (reference example/src/{chat_cli,
chat_streaming}.rs).

Usage: python examples/chat_cli.py --model-path /path/to/model [--quant q8]
"""

import argparse
import sys

import jax.numpy as jnp

from crane_tpu.generation.config import GenerationConfig
from crane_tpu.sdk.client import ChatClient, LlmClient

ap = argparse.ArgumentParser()
ap.add_argument("--model-path", required=True)
ap.add_argument("--quant", choices=[None, "q8", "q4"], default=None)
ap.add_argument("--system", default=None)
ap.add_argument("--thinking", action="store_true")
args = ap.parse_args()

quant_bits = {"q8": 8, "q4": 4}.get(args.quant)
llm = LlmClient.from_pretrained(args.model_path, quant_bits=quant_bits)
chat = ChatClient(llm, system=args.system)
gen = GenerationConfig(max_new_tokens=1024, do_sample=True, temperature=0.7,
                       top_p=0.95, top_k=40, repetition_penalty=1.05)

print("crane-tpu chat — empty line to quit, /clear to reset history")
while True:
    try:
        line = input("you> ").strip()
    except (EOFError, KeyboardInterrupt):
        break
    if not line:
        break
    if line == "/clear":
        chat.clear()
        continue
    chat.history.append({"role": "user", "content": line})
    print("bot> ", end="", flush=True)
    pieces = []
    for piece in llm.chat_stream(chat.history, gen, enable_thinking=args.thinking or None):
        sys.stdout.write(piece)
        sys.stdout.flush()
        pieces.append(piece)
    print()
    chat.history.append({"role": "assistant", "content": "".join(pieces)})
