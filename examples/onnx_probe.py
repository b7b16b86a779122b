"""Inspect an ONNX graph with the built-in evaluator (reference
example/src/onnx_probe.rs: load a graph, print IO + op census, optionally
run it on zero inputs).

Usage: python examples/onnx_probe.py --model model.onnx [--run]
"""

import argparse
import collections

import numpy as np

from crane_tpu.onnx import Session, read_file

ap = argparse.ArgumentParser()
ap.add_argument("--model", required=True)
ap.add_argument("--run", action="store_true",
                help="evaluate on all-zero inputs shaped from the graph's "
                "declared specs (symbolic dims become 1)")
args = ap.parse_args()

model = read_file(args.model)
g = model.graph
print(f"graph: {g.name or '<unnamed>'} (opset {model.opset})")
for name in g.inputs:
    dt, sh = g.input_specs.get(name, (None, None))
    print(f"input  {name}: dtype={np.dtype(dt).name if dt else '?'} shape={sh}")
print(f"outputs: {g.outputs}")
print(f"initializers: {len(g.initializers)} "
      f"({sum(v.nbytes for v in g.initializers.values()) / 1e6:.1f} MB)")
census = collections.Counter(n.op_type for n in g.nodes)
print(f"nodes: {len(g.nodes)}")
for op, n in census.most_common():
    print(f"  {op:24s} {n}")

if args.run:
    sess = Session(model)
    feeds = {}
    for name in sess.input_names:
        dt, sh = g.input_specs.get(name, (None, None))
        shape = tuple(1 if d < 0 else d for d in (sh or (1,)))
        feeds[name] = np.zeros(shape, dt or np.float32)
    outs = sess.run(feeds)
    for name, v in outs.items():
        v = np.asarray(v)
        print(f"out {name}: shape={v.shape} dtype={v.dtype}")
