"""Pallas-vs-XLA microbenchmarks for the aggregation engine's hot ops.

Records the measurements behind the round-2 kernel decision (VERDICT item
2: "beat XLA or retire with numbers") into PALLAS_MICROBENCH.json:

1. row gather  — XLA `jnp.take` vs a Pallas per-row-DMA pipeline
2. gather+mean — XLA fused take/einsum vs ops/pallas_aggregate kernels
3. scatter-add — XLA `.at[].add` (the backward of a gather), plus the
   sorted-segment alternative
4. pair scores — dense SDDMM block, XLA vs ops/sddmm.pallas_pair_scores

Conclusion the numbers support (see BASELINE.md "Kernel decision"):
XLA's dynamic-address ops on this chip run at ~170M rows/s (gather) and
~60M rows/s (scatter) — near the dynamic-addressing issue limit, which a
Pallas per-row DMA pipeline cannot beat (one async copy costs ~34 ns of
issue bandwidth; measured 6x SLOWER).  The right lever is structural
(train/cached.py removes the hot gathers/scatters entirely), so the
aggregate kernels stay OFF by default (`GraphSageConfig.impl="xla"`).

Run on a real TPU: python tools/pallas_microbench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from graphsage_tpu.ops.aggregate import mean_aggregate
    from graphsage_tpu.ops.pallas_aggregate import pallas_mean_aggregate
    from graphsage_tpu.ops.sddmm import dense_pair_scores, pallas_pair_scores

    n, h = 100_000, 128
    u, s = 45056, 11
    rng = np.random.RandomState(0)

    def force(o):
        leaf = [x for x in jax.tree_util.tree_leaves(o)
                if hasattr(x, "shape")][-1]
        float(jnp.sum(leaf))

    def timeit(f, *a, reps=20):
        o = f(*a)
        force(o)
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(*a)
        force(o)
        return (time.perf_counter() - t0) / reps * 1000

    results = {"device": jax.devices()[0].device_kind, "rows": []}

    def record(name, ms, detail=""):
        row = {"op": name, "ms": round(ms, 3), "detail": detail}
        results["rows"].append(row)
        print(json.dumps(row), flush=True)

    table = jnp.asarray(np.random.default_rng(1).standard_normal(
        (n, h), dtype=np.float32))
    idx = jnp.asarray(rng.randint(0, n, (u, s)).astype(np.int32))
    mask = jnp.asarray((rng.rand(u, s) < 0.9).astype(np.float32))
    flat = idx.reshape(-1)

    # 1. row gather
    xg = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    ms = timeit(xg, table, flat)
    record("gather_xla_w128_f32", ms,
           f"{u * s} rows: {u * s / ms / 1e3:.0f}M rows/s")

    TILE, NSEM = 2048, 32
    u_flat = u * s
    u_pad = (u_flat + TILE - 1) // TILE * TILE
    flat_p = jnp.pad(flat, (0, u_pad - u_flat))

    def gather_kernel(idx_ref, table_ref, out_ref, sems):
        def get_dma(j):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[j], 1), :],
                out_ref.at[pl.ds(j, 1), :],
                sems.at[j % NSEM])

        def warm(j, _):
            get_dma(j).start()
            return 0

        jax.lax.fori_loop(0, NSEM, warm, 0)

        def body(j, _):
            get_dma(j).wait()

            @pl.when(j + NSEM < TILE)
            def _():
                get_dma(j + NSEM).start()
            return 0

        jax.lax.fori_loop(0, TILE, body, 0)

    @jax.jit
    def pallas_gather(t, i):
        return pl.pallas_call(
            gather_kernel,
            grid=(u_pad // TILE,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda g: (g,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((TILE, h), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
            out_shape=jax.ShapeDtypeStruct((u_pad, h), jnp.float32),
        )(i, t)

    assert bool(jnp.all(pallas_gather(table, flat_p)[:u_flat]
                        == xg(table, flat)))
    ms = timeit(pallas_gather, table, flat_p)
    record("gather_pallas_dma_w128_f32", ms,
           f"per-row DMA pipeline, {NSEM} in flight: "
           f"{u_flat / ms / 1e3:.0f}M rows/s")

    # 2. gather+mean
    xa = jax.jit(lambda t: mean_aggregate(t, idx, mask))
    record("mean_agg_xla", timeit(xa, table), f"[{u},{s}] over [{n},{h}]")
    pa = jax.jit(lambda t: pallas_mean_aggregate(t, idx, mask))
    np.testing.assert_allclose(np.asarray(pa(table)), np.asarray(xa(table)),
                               rtol=1e-5, atol=1e-5)
    record("mean_agg_pallas_rowloop", timeit(pa, table),
           "ops/pallas_aggregate row-at-a-time kernel")

    # 3. scatter-add (gather backward)
    g = jnp.asarray(np.random.default_rng(5).standard_normal(
        (u, h), dtype=np.float32))
    contrib = (g[:, None, :] * mask[:, :, None]).reshape(-1, h)
    sc = jax.jit(lambda c: jnp.zeros((n, h), jnp.float32).at[flat].add(c))
    record("scatter_add_xla", timeit(sc, contrib),
           f"{u * s} rows into [{n},{h}]: "
           f"{u * s / timeit(sc, contrib) / 1e3:.0f}M rows/s")
    order = jnp.argsort(flat)
    flat_s, contrib_s = flat[order], contrib[order]
    scs = jax.jit(lambda c: jnp.zeros((n, h), jnp.float32)
                  .at[flat_s].add(c, indices_are_sorted=True))
    record("scatter_add_xla_presorted", timeit(scs, contrib_s),
           "sorted indices (sort+permute cost ~9 ms extra, not counted)")

    # 4. SDDMM pair scores
    emb = jnp.asarray(np.random.default_rng(7).standard_normal(
        (2048, h), dtype=np.float32))
    targets = jnp.asarray(rng.randint(0, 2048, 512).astype(np.int32))
    xd = jax.jit(lambda e: dense_pair_scores(e, targets))
    record("pair_scores_xla", timeit(xd, emb), "[512 x 2048] block")
    pd = jax.jit(lambda e: pallas_pair_scores(e, targets))
    np.testing.assert_allclose(np.asarray(pd(emb)), np.asarray(xd(emb)),
                               rtol=2e-5, atol=2e-5)
    record("pair_scores_pallas", timeit(pd, emb),
           "fused normalize+matmul tiles (ops/sddmm.py)")

    with open("PALLAS_MICROBENCH.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote PALLAS_MICROBENCH.json")


if __name__ == "__main__":
    main()
