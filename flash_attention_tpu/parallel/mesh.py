"""Mesh construction helpers.

Axis convention (used across the framework):
  "data"    — batch / data parallelism (no comms during attention)
  "model"   — tensor parallelism over attention heads
  "context" — sequence parallelism over the KV axis (ring attention)
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    model: int = 1,
    context: int = 1,
    *,
    devices=None,
) -> Mesh:
    """Build a (data, model, context) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = data * model * context
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, model, context)
    return Mesh(arr, axis_names=("data", "model", "context"))


def auto_mesh(n_devices: int | None = None, *, num_kv_heads: int = 8) -> Mesh:
    """Default serving mesh: shard heads up to num_kv_heads, rest on data.

    GQA co-location rule (q heads stay with their KV head): the model axis
    never exceeds the KV head count.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    model = math.gcd(n_devices, num_kv_heads)
    data = n_devices // model
    return make_mesh(data=data, model=model, devices=devices[:n_devices])
