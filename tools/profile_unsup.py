"""Profile the unsup cached row's pair-loss block (VERDICT r2 item 3).

The unsup cached step (218M edges/s) lags the sup step (343M) at identical
encode shapes; the delta is the pair-loss block.  This tool times, at the
production bench shape (U=32768 extended rows, B=4096 targets, P=6 / M=20
pairs, H=128, bf16):

  sup_step          the cached sup step (baseline delta reference)
  unsup_step        the cached unsup step as shipped
  block:<variant>   value_and_grad of JUST the pair loss wrt embeddings:
      sddmm_pallas  dense [B, U] score block, fused pallas fwd (shipped r2)
      sddmm_xla     dense [B, U] score block, XLA fwd
      gathered      per-pair gathers: normalize once, gather q rows,
                    batched dot — no [B, U] materialization anywhere
                    (fwd cost ∝ pairs·H, not B·U; bwd is a row scatter-add)

The dense block moves ≥3·B·U·4 bytes/step (fwd write + bwd scatter-init +
2 GEMM reads) = 1.6 GB at this shape to use B·(P+M) = 106k scalars; the
gathered path moves ~3·pairs·H rows.  Writes PROFILE_UNSUP.json.

Reference semantics being preserved throughout: unsup 'normal' loss,
/root/reference/src/models.py:78-96.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

U, B, P, M, H = 32768, 4096, 6, 20, 128
STEPS = 20
REPS = 3


def _timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    reps = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        reps.append(time.perf_counter() - t0)
    return float(np.median(reps))


def make_pairs(rng):
    return {
        "target_rows": jnp.asarray(np.arange(B, dtype=np.int32)),
        "pos_q": jnp.asarray(rng.randint(0, U, (B, P)).astype(np.int32)),
        "pos_mask": jnp.ones((B, P), jnp.float32),
        "neg_q": jnp.asarray(rng.randint(0, U, (B, M)).astype(np.int32)),
        "neg_mask": jnp.ones((B, M), jnp.float32),
        "node_valid": jnp.ones((B,), jnp.float32),
    }


def block_fn(variant: str, pairs):
    """value_and_grad of the pair loss wrt [U, H] embeddings."""
    from graphsage_tpu.losses import _unsup_loss_from_cosines
    from graphsage_tpu.ops.sddmm import (
        _pallas_scores_diff,
        dense_pair_scores,
        gathered_pair_cosines,
        sample_scores,
    )

    def loss(emb):
        if variant == "gathered":
            pos_cos, neg_cos = gathered_pair_cosines(
                emb, pairs["target_rows"], pairs["pos_q"], pairs["neg_q"])
        else:
            score = (_pallas_scores_diff(emb, pairs["target_rows"], 1e-8)
                     if variant == "sddmm_pallas"
                     else dense_pair_scores(emb, pairs["target_rows"]))
            pos_cos = sample_scores(score, pairs["pos_q"])
            neg_cos = sample_scores(score, pairs["neg_q"])
        return _unsup_loss_from_cosines(
            pos_cos, pairs["pos_mask"], neg_cos, pairs["neg_mask"],
            pairs["node_valid"], "normal", 10.0, 0.0)

    return jax.jit(jax.value_and_grad(loss))


def main():
    from graphsage_tpu.data import synthetic_power_law
    from graphsage_tpu.train.cached import (
        make_cached_sup_epoch,
        make_cached_unsup_step,
        refresh_leaf_cache,
    )

    results = {"shape": {"U": U, "B": B, "P": P, "M": M, "H": H},
               "device": jax.devices()[0].device_kind,
               "note": ("standalone block_* timings are dispatch-latency "
                        "floored on the remote backend (~25 ms/call) — "
                        "the discriminating measure is unsup_step_ms vs "
                        "sup_step_ms inside the scanned epoch. "
                        "unsup_step runs the production dispatcher "
                        "(gathered formulation at this shape).")}
    rng = np.random.RandomState(3)
    pairs = make_pairs(rng)

    emb = jnp.asarray(rng.randn(U, H).astype(np.float32)).astype(jnp.bfloat16)
    for variant in ("sddmm_pallas", "sddmm_xla", "gathered"):
        fn = block_fn(variant, pairs)
        dt = _timeit(fn, emb)
        results[f"block_{variant}_ms"] = round(dt * 1000, 3)
        print(f"block {variant}: {dt*1000:.3f} ms", flush=True)
    # numeric parity of the variants on the same inputs
    l_ref, g_ref = block_fn("sddmm_xla", pairs)(emb)
    for variant in ("sddmm_pallas", "gathered"):
        l, g = block_fn(variant, pairs)(emb)
        dl = abs(float(l) - float(l_ref))
        dg = float(jnp.max(jnp.abs(g.astype(jnp.float32)
                                   - g_ref.astype(jnp.float32))))
        results[f"parity_{variant}"] = {"dloss": dl, "dgrad_max": dg}
        print(f"parity {variant}: dloss={dl:.2e} dgrad={dg:.2e}", flush=True)

    # full steps at the bench shape
    from bench import _setup, run_unsup_row  # noqa: F401
    pl = synthetic_power_law(100_000, 1_000_000, num_feats=602,
                             num_classes=16, seed=0)
    pad = pl.graph.to_padded_sampled(32, np.random.RandomState(99))
    (mcfg, params, feats, neighbors, degrees, batches,
     labels) = _setup(pl, pad, "bfloat16", U, STEPS, H)
    key = jax.random.PRNGKey(824)

    sup = jax.jit(make_cached_sup_epoch(mcfg, fanout=10))
    dt = _timeit(lambda *a: sup(*a)[1], params, feats, neighbors, degrees,
                 batches, labels, key)
    results["sup_step_ms"] = round(dt / STEPS * 1000, 3)
    print(f"sup step: {dt/STEPS*1000:.3f} ms", flush=True)

    step = make_cached_unsup_step(mcfg, unsup_loss="normal", fanout=10)

    @jax.jit
    def unsup_epoch(params, feats, neighbors, degrees, batches, labels, key):
        k_cache, k_steps = jax.random.split(key)
        cache_feats, cache_count = refresh_leaf_cache(
            k_cache, feats, neighbors, degrees, 10)

        def body(carry, xs):
            p, k = carry
            b, lab = xs
            k, sub = jax.random.split(k)
            p, loss = step(p, feats, cache_feats, cache_count, neighbors,
                           degrees, b, lab, pairs, sub)
            return (p, k), loss

        (params, _), losses = jax.lax.scan(body, (params, k_steps),
                                           (batches, labels))
        return losses

    dt = _timeit(unsup_epoch, params, feats, neighbors, degrees, batches,
                 labels, key)
    results["unsup_step_ms"] = round(dt / STEPS * 1000, 3)
    print(f"unsup step: {dt/STEPS*1000:.3f} ms", flush=True)

    with open("PROFILE_UNSUP.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
