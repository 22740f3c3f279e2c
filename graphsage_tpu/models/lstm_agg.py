"""LSTM neighborhood aggregator.

Absent from the reference (only MEAN/MAX exist, reference src/models.py:311,
316; SURVEY §2a comp. 9) but required by the target config family
(BASELINE.json config 4: "Cora LSTM aggregator with fixed-degree padded
neighborhoods") following the original GraphSAGE paper (Hamilton et al.
2017, §3.1 LSTM aggregator).

Design: neighbors arrive as a fixed-degree padded sequence [U, S, D] with a
validity mask (our samplers emit neighbors in randomized order, supplying
the paper's random permutation).  A standard LSTM cell scans the S slots via
`lax.scan`; masked slots pass (h, c) through unchanged, so padding does not
perturb the state.  The final hidden state is the aggregate.  Hidden size =
input feature size so the output is shape-compatible with SageLayer's
concat ([self ‖ agg] → W[out, 2·in]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graphsage_tpu.ops.aggregate import gather_rows


def init_lstm_agg(key: jax.Array, feat_size: int, dtype=jnp.float32) -> dict:
    """Standard LSTM cell parameters, gates packed [i, f, g, o].
    Uniform(±1/sqrt(H)) init (torch.nn.LSTM default)."""
    h = feat_size
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / float(np.sqrt(h))
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    return {
        "w_ih": u(k1, (4 * h, feat_size)),
        "w_hh": u(k2, (4 * h, h)),
        "b_ih": u(k3, (4 * h,)),
        "b_hh": u(k4, (4 * h,)),
    }


def _lstm_cell(params: dict, x: jax.Array, h: jax.Array, c: jax.Array):
    """One recurrence step.  Gates compute in the input dtype (the MXU
    accumulates bf16 GEMMs in f32 internally; keeping the gate
    *activations* in bf16 halves the dominant HBM/VPU bytes — measured
    9.1 vs 11.4 ms/step at the hybrid bench shape, PROFILE_LSTM.json);
    the cell state ``c`` accumulates in f32 across steps regardless."""
    gates = (jnp.dot(x, params["w_ih"].T.astype(x.dtype))
             + jnp.dot(h, params["w_hh"].T.astype(h.dtype))
             + (params["b_ih"] + params["b_hh"]).astype(x.dtype))
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = (f.astype(jnp.float32) * c
             + i.astype(jnp.float32) * g.astype(jnp.float32))
    h_new = o * jnp.tanh(c_new).astype(x.dtype)
    return h_new, c_new


def lstm_aggregate(params: dict, embed: jax.Array, idx: jax.Array,
                   mask: jax.Array) -> jax.Array:
    """Aggregate neighborhoods with an LSTM over the padded slot sequence.

    embed: [M, D]; idx: [U, S] int32; mask: [U, S].  Returns [U, D].
    """
    return lstm_scan(params, gather_rows(embed, idx), mask)


def lstm_scan(params: dict, gathered: jax.Array, mask: jax.Array) -> jax.Array:
    """LSTM over an already-materialized slot sequence [U, S, D] with a
    [U, S] validity mask (masked slots pass state through).  Returns [U, D].
    Used directly by the cached pipeline's hybrid mode, whose upper-layer
    sequences are tree-contiguous reshapes (no gather needed).

    The scan step is rematerialized (`jax.checkpoint`): the [U, 4H] gate
    activations are recomputed in the backward instead of stored per slot,
    trading spare MXU FLOPs for the HBM residual traffic that bounds this
    op.  Measured at the hybrid bench shape ([32768, 11, 128] bf16,
    fwd+bwd): 11.4 ms baseline → 9.1 ms bf16 gates → 7.2 ms bf16+remat;
    the VERDICT-r2-suggested batched-gate pre-GEMM measured SLOWER
    (15.5 ms — the [U, S, 4H] f32 gate buffer costs more than the small
    per-step GEMMs it saves).  PROFILE_LSTM.json has the full A/B."""
    u, s, d = gathered.shape
    # derive the zero state from the input (not jnp.zeros) so that under
    # shard_map it inherits the sequence's varying manual axes — a literal
    # zeros carry is unvarying and scan rejects the carry-type mismatch
    h0 = gathered[:, 0] * 0
    c0 = gathered[:, 0].astype(jnp.float32) * 0   # f32 cell-state carry

    @jax.checkpoint
    def step(carry, inp):
        h, c = carry
        x, m = inp                                          # [U, D], [U]
        h_new, c_new = _lstm_cell(params, x, h, c)
        mh = m[:, None].astype(h.dtype)
        mc = m[:, None].astype(c.dtype)
        return (mh * h_new + (1 - mh) * h,
                mc * c_new + (1 - mc) * c), None

    xs = (jnp.moveaxis(gathered, 1, 0), jnp.moveaxis(mask, 1, 0))
    (h_final, _), _ = jax.lax.scan(step, (h0, c0), xs)
    return h_final
