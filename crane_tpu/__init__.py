"""crane_tpu — a TPU-native multi-modal inference framework (JAX/XLA/Pallas).

A ground-up rebuild of the capabilities of lucasjinreal/Crane (Rust/Candle local
inference engine; see SURVEY.md) designed TPU-first:

- models are pure functions over parameter pytrees, jit-compiled by XLA
- KV caches are fixed-shape donated buffers (static shapes, no regrow)
- sampling runs in-graph on device (greedy / temperature / top-k / top-p)
- hot sequential ops (Gated-Delta-Net recurrence) are Pallas TPU kernels with
  lax.scan reference paths behind a flag (mirrors the reference's
  CRANE_GDN_PORTABLE cross-check pattern)
- multi-chip scaling uses jax.sharding Mesh + NamedSharding, not per-device code
"""

__version__ = "0.1.0"
