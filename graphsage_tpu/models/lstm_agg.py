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
    gates = (jnp.dot(x, params["w_ih"].T, preferred_element_type=jnp.float32)
             + jnp.dot(h, params["w_hh"].T, preferred_element_type=jnp.float32)
             + params["b_ih"] + params["b_hh"])
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new.astype(x.dtype), c_new.astype(x.dtype)


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
    sequences are tree-contiguous reshapes (no gather needed)."""
    u, s, d = gathered.shape
    # derive the zero state from the input (not jnp.zeros) so that under
    # shard_map it inherits the sequence's varying manual axes — a literal
    # zeros carry is unvarying and scan rejects the carry-type mismatch
    h0 = gathered[:, 0] * 0
    c0 = gathered[:, 0] * 0

    def step(carry, inp):
        h, c = carry
        x, m = inp                                          # [U, D], [U]
        h_new, c_new = _lstm_cell(params, x, h, c)
        m = m[:, None].astype(h.dtype)
        return (m * h_new + (1 - m) * h,
                m * c_new + (1 - m) * c), None

    xs = (jnp.moveaxis(gathered, 1, 0), jnp.moveaxis(mask, 1, 0))
    (h_final, _), _ = jax.lax.scan(step, (h0, c0), xs)
    return h_final
