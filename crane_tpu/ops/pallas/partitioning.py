"""GSPMD/Shardy partitioning rules for the Pallas attention kernels.

A ``pallas_call`` lowers to an opaque custom call, and XLA's SPMD
partitioners cannot see inside it: under a sharded ``jit`` the default
behavior is to ALL-GATHER every operand to its full global shape on every
device, run the kernel replicated, then re-shard the result. For decode
attention that would move the entire KV cache buffer over ICI once per
layer per step — the one thing the kernels were built to avoid.

Attention is embarrassingly parallel over kv heads (each query-head group
attends only to its own kv head), so the right partitioning is: split the
kv-head axis across the ``tp`` mesh axis and the batch axis across ``dp``,
and run the *same kernel* on the local shard with zero collectives. This
module teaches that to both partitioners via
``jax.experimental.custom_partitioning``:

- a Shardy ``sharding_rule`` (einsum-like, with ``(h g)`` compound factors
  tying the query-head axis to the kv-head axis) drives propagation, and
- a ``partition`` callback lowers to the per-shard kernel call, deriving
  the shard-local ``n_kv_heads`` from the shard shapes.

The reference has no counterpart (single-device by design, SURVEY.md §2.9);
this is what makes ``--tp N`` serving run the fused kernels sharded instead
of replicated. Validated on the virtual 8-device mesh: local shapes reach
the kernel, numerics match single-device, and the compiled HLO contains no
all-gather (tests/test_kernel_partitioning.py).
"""

from __future__ import annotations

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.custom_partitioning import custom_partitioning

# test hook: partition() appends (name, local_arg_shapes) at trace time so
# tests can assert the kernel really ran on shard-local shapes
partition_trace_log: list = []


def _axis_size(mesh, ax) -> int:
    if ax is None:
        return 1
    if isinstance(ax, (tuple, list)):
        return int(np.prod([mesh.shape[a] for a in ax]))
    return int(mesh.shape[ax])


def _spec_axis(arg_shapes, sources):
    """First mesh axis found at the given ``(arg_index, dim)`` positions."""
    for idx, dim in sources:
        sharding = getattr(arg_shapes[idx], "sharding", None)
        spec = getattr(sharding, "spec", None)
        if spec is not None and len(spec) > dim and spec[dim] is not None:
            return spec[dim]
    return None


def make_head_partitioned(
    name: str,
    fn,
    *,
    templates,
    batch_sources,
    head_sources,
    n_heads_total: int,
    rule: str,
    need_replication_factors: tuple,
    factor_sizes: dict,
):
    """Wrap ``fn(*arrays)`` so SPMD shards it over (batch, kv-head) axes.

    ``templates``: per-operand spec builders ``(bax, hax) -> PartitionSpec``,
    plus the result template last. ``batch_sources`` / ``head_sources``:
    ``(arg_index, dim)`` positions whose operand sharding names the mesh
    axis for batch / heads (first match wins — the KV cache operand is the
    authority since the engine places it explicitly). ``fn`` must derive
    every shape-dependent static (local n_kv_heads etc.) from its argument
    shapes, because the partitioner calls it once with global shapes and
    once per shard with local shapes.
    """
    p = custom_partitioning(fn)
    *arg_templates, out_template = templates

    def _resolve(mesh, arg_shapes):
        bax = _spec_axis(arg_shapes, batch_sources)
        hax = _spec_axis(arg_shapes, head_sources)
        batch = arg_shapes[0].shape[0]
        if bax is not None and batch % _axis_size(mesh, bax) != 0:
            bax = None
        if hax is not None and n_heads_total % _axis_size(mesh, hax) != 0:
            hax = None
        return bax, hax

    def partition(mesh, arg_shapes, result_shape):
        bax, hax = _resolve(mesh, arg_shapes)
        arg_shardings = tuple(
            NamedSharding(mesh, t(bax, hax)) for t in arg_templates
        )
        out_sharding = NamedSharding(mesh, out_template(bax, hax))

        def lower_fn(*args):
            partition_trace_log.append((name, tuple(a.shape for a in args)))
            return fn(*args)

        return mesh, lower_fn, out_sharding, arg_shardings

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        bax, hax = _resolve(mesh, arg_shapes)
        return NamedSharding(mesh, out_template(bax, hax))

    p.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=rule,
        need_replication_factors=need_replication_factors,
        **factor_sizes,
    )
    return p
