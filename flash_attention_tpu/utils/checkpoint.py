"""KV-cache checkpoint / resume: save and restore cache pytrees to disk.

The reference is a stateless benchmark (SURVEY.md §5 "Checkpoint / resume:
None"); the serving layer here holds multi-GiB KV caches (dense
``models.attention.KVCache`` and paged ``ops.paged.PagedKVCache``), so
sessions need a way to persist and resume. This is a plain pytree
device_get/put round-trip with an integrity-checked metadata header:

  * every array leaf is written bit-exactly (fp8/bf16 payloads are stored as
    raw bytes with the logical dtype recorded in the header, so exotic dtypes
    survive numpy serialization),
  * ``load_kv_cache`` restores INTO the structure of a template cache (one
    freshly built by the engine's init path) and verifies shape/dtype leaf by
    leaf — a checkpoint from a different config fails loudly, not silently,
  * restore is exact: decode continuation after a round-trip is
    token-identical to an uninterrupted run (tests/test_checkpoint.py).

Format: a single ``.npz`` (zip) file; member ``__meta__`` holds a JSON header
with per-leaf logical dtype/shape plus a format version.
"""

from __future__ import annotations

import json
import pathlib

import jax
import numpy as np

_FORMAT_VERSION = 1


def _to_storage(x: np.ndarray) -> np.ndarray:
    """View any array as raw uint8 bytes (serialization-safe for fp8/bf16)."""
    return np.ascontiguousarray(x).view(np.uint8).reshape(-1)


def save_kv_cache(path, cache) -> None:
    """Serialize a cache pytree (any pytree of arrays) to ``path`` (.npz).

    Works for ``KVCache``, ``PagedKVCache``, per-layer tuples of either, or
    any other pytree whose leaves are jax/numpy arrays (None leaves are
    fine — the pytree flattener drops them and the template restores them).
    """
    path = pathlib.Path(path)
    leaves = jax.tree_util.tree_leaves(cache)
    host = [np.asarray(jax.device_get(leaf)) for leaf in leaves]
    meta = {
        "version": _FORMAT_VERSION,
        "leaves": [
            {"dtype": str(a.dtype), "shape": list(a.shape)} for a in host
        ],
    }
    arrays = {f"leaf_{i}": _to_storage(a) for i, a in enumerate(host)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    tmp.replace(path)  # atomic publish


def load_kv_cache(path, template, *, device_put: bool = True):
    """Restore a cache saved by :func:`save_kv_cache` into ``template``'s
    structure.

    Args:
      path: the ``.npz`` written by save_kv_cache.
      template: a cache pytree with the SAME structure, shapes and dtypes as
        the one saved (e.g. freshly built by ``init_kv_cache`` /
        ``init_paged_cache`` with the same config). Only its structure and
        aval metadata are read — its values are discarded.
      device_put: move restored leaves onto the default device (False keeps
        them as numpy, e.g. for inspection).

    Returns:
      A pytree of the template's type holding the checkpointed values.

    Raises:
      ValueError: version/structure/shape/dtype mismatch.
    """
    path = pathlib.Path(path)
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode("utf-8"))
        if meta.get("version") != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported checkpoint version {meta.get('version')!r}"
            )
        t_leaves, treedef = jax.tree_util.tree_flatten(template)
        recs = meta["leaves"]
        if len(recs) != len(t_leaves):
            raise ValueError(
                f"checkpoint has {len(recs)} leaves, template has "
                f"{len(t_leaves)} — different cache structure/config"
            )
        out = []
        for i, (rec, t) in enumerate(zip(recs, t_leaves)):
            want_dtype = np.dtype(jax.numpy.dtype(rec["dtype"]))
            want_shape = tuple(rec["shape"])
            t_shape = tuple(t.shape)
            t_dtype = np.dtype(t.dtype)
            if want_shape != t_shape or want_dtype != t_dtype:
                raise ValueError(
                    f"leaf {i}: checkpoint {want_dtype}{list(want_shape)} vs "
                    f"template {t_dtype}{list(t_shape)} — config mismatch"
                )
            raw = z[f"leaf_{i}"]
            arr = raw.view(want_dtype).reshape(want_shape)
            out.append(jax.device_put(arr) if device_put else arr)
    return jax.tree_util.tree_unflatten(treedef, out)
