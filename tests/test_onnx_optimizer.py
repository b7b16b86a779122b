"""ONNX graph-optimizer tests (reference: crane-core/src/onnx/optimizer/).

Every rewrite must be value-preserving: each test compares the optimized
session against ``Session(..., optimize=False)`` on the same feeds, plus
structural assertions on the report (the reference's OptimizationReport
fields, optimizer/mod.rs:36-49).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from crane_tpu.onnx.session import Session  # noqa: E402
from crane_tpu.onnx.wire import Graph, Model, Node  # noqa: E402


def mk(op, ins, outs, **attrs):
    return Node(op_type=op, inputs=ins, outputs=outs, name=outs[0], attrs=attrs)


def run_both(graph_fn, feeds):
    plain = Session(Model(graph=graph_fn()), optimize=False).run(feeds)
    opt_sess = Session(Model(graph=graph_fn()))
    opt = opt_sess.run(feeds)
    assert plain.keys() == opt.keys()
    for k in plain:
        np.testing.assert_allclose(opt[k], plain[k], rtol=1e-6, atol=1e-7)
    return opt_sess


class TestAliasElimination:
    def test_identity_chain_removed(self):
        def g():
            return Graph(
                nodes=[mk("Identity", ["x"], ["a"]),
                       mk("Identity", ["a"], ["b"]),
                       mk("Neg", ["b"], ["y"])],
                initializers={}, inputs=["x"], outputs=["y"])

        sess = run_both(g, {"x": np.arange(4.0, dtype=np.float32)})
        assert sess.report.removed_alias_nodes == 2
        assert [n.op_type for n in sess.graph.nodes] == ["Neg"]

    def test_identity_feeding_graph_output_kept(self):
        """Renaming an Identity that PRODUCES a graph output would change
        the session's public output name — it must stay."""
        def g():
            return Graph(
                nodes=[mk("Neg", ["x"], ["a"]), mk("Identity", ["a"], ["y"])],
                initializers={}, inputs=["x"], outputs=["y"])

        sess = run_both(g, {"x": np.ones(3, np.float32)})
        assert [n.op_type for n in sess.graph.nodes] == ["Neg", "Identity"]

    def test_dropout_with_consumed_mask_kept(self):
        def g():
            return Graph(
                nodes=[mk("Dropout", ["x"], ["a", "mask"]),
                       mk("Neg", ["a"], ["y"]),
                       mk("Cast", ["mask"], ["m2"], to=1)],
                initializers={}, inputs=["x"], outputs=["y", "m2"])

        sess = run_both(g, {"x": np.ones(3, np.float32)})
        assert any(n.op_type == "Dropout" for n in sess.graph.nodes)

    def test_inference_dropout_removed(self):
        def g():
            return Graph(
                nodes=[mk("Dropout", ["x"], ["a"]), mk("Neg", ["a"], ["y"])],
                initializers={}, inputs=["x"], outputs=["y"])

        sess = run_both(g, {"x": np.ones(3, np.float32)})
        assert [n.op_type for n in sess.graph.nodes] == ["Neg"]


class TestConstantFolding:
    def test_folds_static_subgraph(self):
        """A shape-computation chain over initializers collapses to one
        initializer; the runtime then evaluates a single node per call."""
        def g():
            return Graph(
                nodes=[mk("Add", ["c1", "c2"], ["s"]),
                       mk("Mul", ["s", "c1"], ["t"]),
                       mk("Add", ["x", "t"], ["y"])],
                initializers={"c1": np.float32(2.0), "c2": np.float32(3.0)},
                inputs=["x"], outputs=["y"])

        sess = run_both(g, {"x": np.arange(3.0, dtype=np.float32)})
        assert sess.report.folded_nodes == 2
        assert [n.op_type for n in sess.graph.nodes] == ["Add"]
        np.testing.assert_allclose(sess.graph.initializers["t"], 10.0)

    def test_constant_node_folds(self):
        def g():
            return Graph(
                nodes=[mk("Constant", [], ["c"], value=np.float32(4.0)),
                       mk("Mul", ["x", "c"], ["y"])],
                initializers={}, inputs=["x"], outputs=["y"])

        sess = run_both(g, {"x": np.ones(2, np.float32)})
        assert sess.report.folded_nodes == 1
        assert [n.op_type for n in sess.graph.nodes] == ["Mul"]

    def test_size_cap_keeps_node(self):
        """A folded result above max_folded_elements is discarded and the
        node kept (reference: max_folded_elements, optimizer/mod.rs:20-21)."""
        from crane_tpu.onnx.optimizer import optimize

        g = Graph(
            nodes=[mk("ConstantOfShape", ["shape"], ["big"],
                      value=np.asarray([1.0], np.float32)),
                   mk("Mul", ["x", "big"], ["y"])],
            initializers={"shape": np.asarray([2_000_000], np.int64)},
            inputs=["x"], outputs=["y"])
        sess = Session(Model(graph=g), optimize=False)
        report = optimize(g, lambda n, i: sess._eval(n, i, {}))
        assert report.folded_nodes == 0
        assert [n.op_type for n in g.nodes] == ["ConstantOfShape", "Mul"]

    def test_random_ops_never_fold(self):
        def g():
            return Graph(
                nodes=[mk("RandomNormal", [], ["r"], shape=[2]),
                       mk("Add", ["x", "r"], ["y"])],
                initializers={}, inputs=["x"], outputs=["y"])

        sess = Session(Model(graph=g()))
        assert sess.report.folded_nodes == 0
        assert any(n.op_type == "RandomNormal" for n in sess.graph.nodes)


class TestDeadElimination:
    def test_unused_branch_and_initializer_removed(self):
        def g():
            return Graph(
                nodes=[mk("Neg", ["x"], ["y"]),
                       mk("Mul", ["x", "w_dead"], ["unused"]),
                       mk("Exp", ["unused"], ["unused2"])],
                initializers={"w_dead": np.ones((4,), np.float32),
                              "w_live": np.ones((1,), np.float32)},
                inputs=["x"], outputs=["y"])

        sess = run_both(g, {"x": np.arange(4.0, dtype=np.float32)})
        assert sess.report.removed_dead_nodes == 2
        # w_dead fed only dead nodes; w_live was never referenced
        assert sess.report.removed_initializers == 2
        assert sess.graph.initializers == {}


def atan2_decomposition_graph():
    """The torch.onnx.export-style atan2 subgraph
    (reference fuse_atan2.rs:8-12)."""
    pi = np.float32(np.pi)
    return Graph(
        nodes=[
            mk("Div", ["yv", "xv"], ["d"]),
            mk("Atan", ["d"], ["at"]),
            mk("Greater", ["yv", "zero"], ["gy"]),
            mk("Add", ["at", "pi"], ["addpi"]),
            mk("Sub", ["at", "pi"], ["subpi"]),
            mk("Where", ["gy", "addpi", "subpi"], ["inner"]),
            mk("Less", ["xv", "zero"], ["lx"]),
            mk("Where", ["lx", "inner", "at"], ["out"]),
        ],
        initializers={"zero": np.float32(0.0), "pi": pi},
        inputs=["yv", "xv"], outputs=["out"])


class TestAtan2Fusion:
    def test_fuses_and_matches_values(self):
        rng = np.random.default_rng(0)
        y = rng.standard_normal(64).astype(np.float32)
        x = rng.standard_normal(64).astype(np.float32)
        sess = run_both(atan2_decomposition_graph, {"yv": y, "xv": x})
        assert sess.report.fused_atan2_nodes == 1
        assert [n.op_type for n in sess.graph.nodes] == ["Atan2"]
        np.testing.assert_allclose(
            sess.run({"yv": y, "xv": x})["out"], np.arctan2(y, x), rtol=1e-6)

    def test_fixes_origin_nan(self):
        """The decomposition NaNs at (0,0) (Div(0,0)); fused atan2 is 0 —
        the reference treats this as a numerical FIX (fuse_atan2.rs:13-17),
        the one place the rewrite intentionally differs."""
        sess = Session(Model(graph=atan2_decomposition_graph()))
        out = sess.run({"yv": np.zeros(1, np.float32),
                        "xv": np.zeros(1, np.float32)})["out"]
        assert out[0] == 0.0
        plain = Session(Model(graph=atan2_decomposition_graph()),
                        optimize=False)
        assert np.isnan(
            plain.run({"yv": np.zeros(1, np.float32),
                       "xv": np.zeros(1, np.float32)})["out"][0])

    def test_mismatched_operand_not_fused(self):
        """Less checking a DIFFERENT tensor than Div's denominator is not
        the atan2 pattern."""
        g = atan2_decomposition_graph()
        g.nodes[6].inputs[0] = "yv"  # Less(y, 0) instead of Less(x, 0)
        sess = Session(Model(graph=g))
        assert sess.report.fused_atan2_nodes == 0


def snake_decomposition_graph(recip_form: bool):
    """snake(x, a) = x + sin(a*x)^2 / a (reference fuse_snake.rs:8-12)."""
    nodes = [
        mk("Mul", ["alpha", "x"], ["ax"]),
        mk("Sin", ["ax"], ["s"]),
        mk("Pow", ["s", "two"], ["s2"]),
    ]
    if recip_form:
        nodes += [mk("Reciprocal", ["alpha"], ["ra"]),
                  mk("Mul", ["s2", "ra"], ["scaled"])]
    else:
        nodes += [mk("Div", ["s2", "alpha"], ["scaled"])]
    nodes += [mk("Add", ["x", "scaled"], ["y"])]
    return Graph(
        nodes=nodes,
        initializers={"alpha": np.float32(0.7), "two": np.float32(2.0)},
        inputs=["x"], outputs=["y"])


class TestSnakeFusion:
    def test_div_form(self):
        x = np.linspace(-3, 3, 32, dtype=np.float32)
        sess = run_both(lambda: snake_decomposition_graph(False), {"x": x})
        assert sess.report.fused_snake_nodes == 1
        assert [n.op_type for n in sess.graph.nodes] == ["Snake"]

    def test_reciprocal_form(self):
        x = np.linspace(-3, 3, 32, dtype=np.float32)
        sess = run_both(lambda: snake_decomposition_graph(True), {"x": x})
        assert sess.report.fused_snake_nodes == 1
        assert [n.op_type for n in sess.graph.nodes] == ["Snake"]

    def test_wrong_exponent_not_fused(self):
        g = snake_decomposition_graph(False)
        g.initializers["two"] = np.float32(3.0)
        sess = Session(Model(graph=g))
        assert sess.report.fused_snake_nodes == 0

    def test_baked_inv_alpha_constant_not_fused(self):
        """An exporter-baked 1/alpha initializer is NOT provably equal to
        the runtime division — conservative: no fusion."""
        g = snake_decomposition_graph(False)
        g.nodes[3] = mk("Mul", ["s2", "inv_a"], ["scaled"])
        g.initializers["inv_a"] = np.float32(1.0 / 0.7)
        sess = Session(Model(graph=g))
        assert sess.report.fused_snake_nodes == 0


class TestSubgraphGuard:
    def test_if_body_skips_folding(self):
        """Graph-valued attrs (If/Loop bodies) may capture outer names —
        only alias removal runs (reference skipped_dce_for_subgraphs)."""
        body = Graph(nodes=[mk("Neg", ["x"], ["nb"])], initializers={},
                     inputs=[], outputs=["nb"])
        els = Graph(nodes=[mk("Identity", ["x"], ["ib"])], initializers={},
                    inputs=[], outputs=["ib"])
        g = Graph(
            nodes=[mk("Add", ["c1", "c1"], ["t"]),
                   mk("If", ["cond"], ["y"], then_branch=body,
                      else_branch=els),
                   mk("Mul", ["y", "t"], ["z"])],
            initializers={"c1": np.float32(1.0)},
            inputs=["x", "cond"], outputs=["z"])
        sess = Session(Model(graph=g))
        assert sess.report.folded_nodes == 0
        assert sess.report.removed_dead_nodes == 0


def test_torch_exported_model_optimizes_identically(tmp_path):
    """End-to-end: a torch-exported conv net runs identically with the
    optimizer on (the round-trip the released-ONNX model paths take)."""
    import torch
    import torch.nn as nn
    import torch.onnx._internal.torchscript_exporter.onnx_proto_utils as _opu

    _opu._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes

    from crane_tpu.onnx import read_file

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.c = nn.Conv1d(2, 3, 3, padding=1)

        def forward(self, x):
            h = self.c(x)
            return torch.tanh(h) + h.sigmoid()

    path = str(tmp_path / "m.onnx")
    torch.onnx.export(M().eval(), (torch.randn(1, 2, 8),), path,
                      input_names=["x"], output_names=["y"], dynamo=False)
    x = np.random.default_rng(0).standard_normal((1, 2, 8)).astype(np.float32)
    plain = Session(read_file(path), optimize=False).run({"x": x})
    opt = Session(read_file(path)).run({"x": x})
    np.testing.assert_allclose(opt["y"], plain["y"], rtol=1e-6, atol=1e-7)
