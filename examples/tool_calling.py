"""Agentic tool-calling loop: reason -> tool_call -> tool -> answer
(reference example/src/ornith_tools.rs, 230 LoC — the full agentic loop).

Usage: python examples/tool_calling.py --model-path /path/to/tool-capable-model
"""

import argparse
import json
import re

from crane_tpu.generation.config import GenerationConfig
from crane_tpu.sdk.client import LlmClient

TOOLS = [
    {
        "type": "function",
        "function": {
            "name": "get_weather",
            "description": "Get the current weather for a city",
            "parameters": {
                "type": "object",
                "properties": {"city": {"type": "string"}},
                "required": ["city"],
            },
        },
    },
    {
        "type": "function",
        "function": {
            "name": "calculate",
            "description": "Evaluate a basic arithmetic expression",
            "parameters": {
                "type": "object",
                "properties": {"expression": {"type": "string"}},
                "required": ["expression"],
            },
        },
    },
]


def run_tool(name: str, arguments: dict) -> str:
    if name == "get_weather":
        return json.dumps({"city": arguments["city"], "temp_c": 21, "sky": "clear"})
    if name == "calculate":
        expr = re.sub(r"[^0-9+\-*/(). ]", "", arguments["expression"])
        return json.dumps({"result": eval(expr)})  # noqa: S307 - sanitized demo
    return json.dumps({"error": f"unknown tool {name}"})


def extract_tool_calls(text: str):
    """Qwen-style <tool_call>{json}</tool_call> blocks."""
    return [
        json.loads(m)
        for m in re.findall(r"<tool_call>\s*(\{.*?\})\s*</tool_call>", text, re.S)
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--question", default="What's the weather in Tokyo, and what is 37*21?")
    ap.add_argument("--max-rounds", type=int, default=5)
    args = ap.parse_args()

    llm = LlmClient.from_pretrained(args.model_path)
    gen = GenerationConfig(max_new_tokens=512, do_sample=False)
    messages = [{"role": "user", "content": args.question}]

    for _ in range(args.max_rounds):
        reply = llm.chat(messages, gen, tools=TOOLS)
        print(f"[assistant] {reply}")
        calls = extract_tool_calls(reply)
        if not calls:
            return
        messages.append({"role": "assistant", "content": reply})
        for call in calls:
            result = run_tool(call["name"], call.get("arguments", {}))
            print(f"[tool {call['name']}] {result}")
            messages.append({"role": "tool", "content": result})
    print("(max tool rounds reached)")


if __name__ == "__main__":
    main()
