"""Independent numpy oracle implementing the reference GraphSAGE forward
semantics (reference src/models.py:241-330) for parity testing on identical
sampled subgraphs — the BASELINE.json per-layer allclose bar.

Written against the *spec* recovered in SURVEY §2/§3, not a translation:
given per-layer sample sets (including self, as produced by
src/models.py:285), it builds union lists, dense 0/1 masks, and applies
mean/max aggregation + relu(W·[self‖agg]) per layer in float64 numpy.
"""

from __future__ import annotations

import numpy as np


def oracle_forward(feats, weights, batch, sample_sets_topdown, gcn=False,
                   agg="MEAN"):
    """feats: [N, D]; weights: list (layer 1 first) of [out, 2*in] (or
    [out, in] gcn); batch: list of node ids; sample_sets_topdown: list,
    entry d = per-node sample sets (incl. self) for the depth-d frontier
    (entry 0 aligns with the batch).  Returns a dict with per-layer
    activations: {"unions": [...], "acts": [h_1, ..., h_L]}."""
    num_layers = len(weights)

    # top-down: build union lists (reference src/models.py:246-253)
    levels = [list(batch)]
    samps = []
    for d in range(num_layers):
        cur = levels[-1]
        s = sample_sets_topdown[d]
        assert len(s) == len(cur)
        union, seen = [], set()
        for ss in s:
            for n in sorted(ss):
                if n not in seen:
                    seen.add(n)
                    union.append(n)
        samps.append(s)
        levels.append(union)

    # bottom-up (reference src/models.py:255-269)
    h = feats.astype(np.float64)
    prev_ids = levels[num_layers]
    h = h[prev_ids]
    acts = []
    unions = []
    for li in range(num_layers, 0, -1):
        cur = levels[li - 1]
        s = samps[li - 1]
        pos = {n: i for i, n in enumerate(prev_ids)}
        # aggregation mask (reference src/models.py:291-308)
        agg_out = np.zeros((len(cur), h.shape[1]))
        for r, v in enumerate(cur):
            members = s[r] if gcn else (s[r] - {v})
            rows = [pos[n] for n in members]
            if not rows:
                continue
            if agg == "MEAN":
                agg_out[r] = h[rows].mean(0)
            elif agg == "MAX":
                agg_out[r] = h[rows].max(0)
            else:
                raise ValueError(agg)
        self_rows = np.array([pos[v] for v in cur])
        self_feats = h[self_rows]
        w = weights[num_layers - li].astype(np.float64)
        if gcn:
            combined = agg_out
        else:
            combined = np.concatenate([self_feats, agg_out], axis=1)
        h = np.maximum(combined @ w.T, 0.0)
        prev_ids = cur
        acts.append(h.copy())
        unions.append(list(cur))

    return {"unions": unions, "acts": acts}
