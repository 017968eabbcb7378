"""Search-path routing matrix (VERDICT r3 task #9).

DenseIndex picks between three device programs — the int4 two-stage scan,
the single-stage Pallas fused scan, and the pure-XLA program — based on
(dtype, dim, batch, corpus size, backend, num_devices).  These tests pin
the routing table so no configuration silently loses its latency path;
PARITY.md carries the measured numbers per route.
"""

import numpy as np
import pytest

from raglite_tpu.index.dense import EXACT_TOPK_MAX_ROWS, DenseIndex


def _index(*, dim=1024, rows=None, dtype="int8", num_devices=1,
           use_pallas=True, use_int4=True):
    import jax
    import jax.numpy as jnp

    n = rows if rows is not None else EXACT_TOPK_MAX_ROWS + 8
    data = jax.random.normal(jax.random.PRNGKey(0), (8, dim), jnp.bfloat16)
    index = DenseIndex.from_device_arrays(
        (jax.random.randint(jax.random.PRNGKey(0), (8, dim), -127, 128, jnp.int8)
         if dtype == "int8" else data),
        jnp.arange(8, dtype=jnp.int32),
        row_scale=(jnp.ones((8,), jnp.float32) if dtype == "int8" else None),
        metric="cosine",
        use_pallas=use_pallas,
    )
    index.use_int4_stage1 = use_int4
    # Routing predicates read num_rows/capacity/num_devices; fake the scale
    # so the matrix is testable without building 131k-row indexes.
    index.num_rows = n
    index.capacity = n
    index.num_devices = num_devices
    return index


@pytest.fixture
def on_tpu(monkeypatch):
    import raglite_tpu.index.dense as dense_mod

    monkeypatch.setattr(dense_mod.jax, "default_backend", lambda: "tpu")
    return dense_mod


ROUTING_MATRIX = [
    # (dtype, dim, batch, rows_over_threshold, num_devices, int4?, pallas?)
    ("int8", 1024, 1, True, 1, True, True),     # the production latency path
    ("int8", 1024, 32, True, 1, True, True),    # largest small-batch bucket
    ("int8", 1024, 33, True, 1, False, False),  # large batch -> XLA program
    ("int8", 1024, 1024, True, 1, False, False),
    ("int8", 384, 1, True, 1, False, True),     # dim % 256 != 0: loses int4,
    #                                             KEEPS the Pallas fused scan
    ("int8", 512, 1, True, 1, True, True),
    ("bfloat16", 1024, 1, True, 1, True, True), # fp16/bf16 stores still
    #                                             route (stage-1 packs int4
    #                                             from the bf16 rows)
    ("int8", 1024, 1, False, 1, False, False),  # small corpus: exact top-k
]


@pytest.mark.parametrize(
    ("dtype", "dim", "batch", "big", "num_devices", "want_int4", "want_pallas"),
    ROUTING_MATRIX,
)
def test_routing_matrix(on_tpu, dtype, dim, batch, big, num_devices,
                        want_int4, want_pallas) -> None:
    rows = (EXACT_TOPK_MAX_ROWS + 4096 if big else 1024)
    # Keep capacity bucket-aligned for the int4 predicate's sharded branch.
    rows = -(-rows // 4096) * 4096
    index = _index(dim=dim, rows=rows, dtype=dtype, num_devices=num_devices)
    assert index._use_int4_stage1(batch, False) == want_int4, "int4 routing"
    assert index._use_fused_kernel(batch) == want_pallas, "pallas routing"


def test_routing_cpu_backend_disables_device_kernels() -> None:
    """Off-TPU (tests, CPU smoke) every batch takes the XLA program."""
    index = _index()
    assert not index._use_int4_stage1(1, False)
    assert not index._use_fused_kernel(1)


def test_exact_flag_bypasses_int4(on_tpu) -> None:
    index = _index(rows=EXACT_TOPK_MAX_ROWS + 4096)
    assert index._use_int4_stage1(1, False)
    assert not index._use_int4_stage1(1, True)  # exact=True -> full scan


def test_sharded_int4_requires_bucket_alignment(on_tpu) -> None:
    """Multi-device int4 routing needs whole buckets per shard; misaligned
    capacities fall back (documented, not silent)."""
    from raglite_tpu.ops.fused_scan import INT4_NUM_BUCKETS

    aligned = INT4_NUM_BUCKETS * 8
    while aligned <= EXACT_TOPK_MAX_ROWS:
        aligned += INT4_NUM_BUCKETS * 8
    index = _index(rows=aligned, num_devices=8)
    assert index._use_int4_stage1(1, False)
    index.capacity = aligned + 1
    assert not index._use_int4_stage1(1, False)


def test_bf16_store_routes_int4_stage1(on_tpu) -> None:
    """The round-2 gap: fp16/bf16 stores silently lost the two-stage path.
    Stage 1 packs int4 FROM the bf16 rows now, so they keep it."""
    index = _index(dtype="bfloat16", rows=EXACT_TOPK_MAX_ROWS + 4096)
    assert index._use_int4_stage1(1, False)
