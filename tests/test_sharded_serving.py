"""Multi-chip serving: the engine's KV caches sharded over a (data, model)
mesh must produce exactly the tokens of the unsharded engine (sharding is a
placement decision, not a numerics change)."""

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from flash_attention_tpu.models.transformer import ModelConfig, init_model_params
from flash_attention_tpu.parallel.mesh import make_mesh
from flash_attention_tpu.serving.engine import Request, ServingEngine
from flash_attention_tpu.serving.paged_engine import PagedServingEngine


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(
        vocab_size=128, model_dim=128, num_layers=2, num_q_heads=4,
        num_kv_heads=4, head_dim=32, mlp_dim=256, dtype="float32",
    )
    params = init_model_params(jax.random.key(0), cfg)
    return cfg, params


REQS = [
    Request(id=1, prompt=(5, 9, 2), max_new_tokens=5),
    Request(id=2, prompt=(100, 3, 44, 8), max_new_tokens=6),
    Request(id=3, prompt=(64, 7), max_new_tokens=4),
    Request(id=4, prompt=(11, 12), max_new_tokens=3),
]


def test_sharded_cache_serving_matches_unsharded(model):
    cfg, params = model
    want = ServingEngine(params, cfg, max_slots=4, max_seq=64).run(REQS)

    mesh = make_mesh(data=2, model=4)  # 8 virtual devices

    def shard_caches(caches):
        kv = NamedSharding(mesh, P("data", "model", None, None))
        ln = NamedSharding(mesh, P("data"))
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, ln if x.ndim == 1 else kv), caches
        )

    eng = ServingEngine(
        params, cfg, max_slots=4, max_seq=64, shard_caches=shard_caches
    )
    got = eng.run(REQS)
    for r in REQS:
        assert got[r.id].tokens == want[r.id].tokens, f"request {r.id}"
    # The cache is genuinely distributed: each leaf spans all 8 devices.
    k0 = eng.caches[0].k
    assert len(k0.sharding.device_set) == 8


def test_sharded_paged_engine_matches_unsharded(model):
    """The paged engine's page pools sharded kv_heads-over-model (the serving
    memory model's natural TP layout: each chip owns its heads' pages; page
    tables and lengths replicated) must be token-identical to unsharded."""
    cfg, params = model
    want = PagedServingEngine(
        params, cfg, max_slots=4, num_pages=16, pages_per_slot=2, page_size=128
    ).run(REQS)

    mesh = make_mesh(data=2, model=4)

    def shard_caches(caches):
        pages = NamedSharding(mesh, P(None, "model", None, None))
        repl = NamedSharding(mesh, P())
        return [
            c._replace(
                k_pages=jax.device_put(c.k_pages, pages),
                v_pages=jax.device_put(c.v_pages, pages),
                page_table=jax.device_put(c.page_table, repl),
                lengths=jax.device_put(c.lengths, repl),
            )
            for c in caches
        ]

    eng = PagedServingEngine(
        params, cfg, max_slots=4, num_pages=16, pages_per_slot=2,
        page_size=128, shard_caches=shard_caches,
    )
    got = eng.run(REQS)
    for r in REQS:
        assert got[r.id].tokens == want[r.id].tokens, f"request {r.id}"
    assert len(eng.caches[0].k_pages.sharding.device_set) == 8
