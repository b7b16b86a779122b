"""Safetensors checkpoint loading (single-file and sharded-index).

Reference behavior: crane-core resolves ``model.safetensors.index.json`` or a
single ``model.safetensors`` and mmaps the shards
(/root/reference/crane-core/src/utils/utils.rs:14+). Same resolution logic
here; tensors are loaded host-side and cast/transferred per the caller's
dtype/sharding (jax device_put handles HtoD).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Iterator

import jax.numpy as jnp
import numpy as np
from safetensors import safe_open


def resolve_safetensors_files(model_dir: str) -> list[str]:
    index = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        files = sorted(set(weight_map.values()))
        return [os.path.join(model_dir, f) for f in files]
    single = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(single):
        return [single]
    # fall back to any .safetensors in the directory
    files = sorted(
        os.path.join(model_dir, f)
        for f in os.listdir(model_dir)
        if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no safetensors checkpoint under {model_dir}")
    return files


def iter_safetensors(model_dir: str) -> Iterator[tuple[str, jnp.ndarray]]:
    """Yield (name, array) for every tensor in the checkpoint."""
    for path in resolve_safetensors_files(model_dir):
        with safe_open(path, framework="flax") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def load_state_dict(model_dir: str) -> dict[str, jnp.ndarray]:
    return dict(iter_safetensors(model_dir))


def save_state_dict(state: dict[str, np.ndarray], path: str) -> None:
    from safetensors.flax import save_file

    save_file(state, path)
