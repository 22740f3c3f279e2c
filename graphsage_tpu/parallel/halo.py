"""Edge-partitioned feature storage with fixed-shape halo exchange.

The scaling design for graphs whose feature table exceeds one chip
(BASELINE.json config 5; SURVEY §2b "graph partitioner"): nodes are
partitioned into contiguous ranges, the feature table is sharded row-wise
over the mesh ``data`` axis, and each device trains on its own batch shard.
Frontier gathers then need rows owned by peers — the halo.  The exchange is
two ``all_to_all``s over ICI:

1. ship the *request tables* (small int32 [n_dev, CAP]) so every owner
   learns which of its rows each peer needs;
2. every owner gathers the requested rows from its local shard and ships
   the payload [n_dev, CAP, D] back.

The requester then assembles its frontier features with one local gather
from the received buffer.  All shapes are static (CAP is bucketed on host),
so the whole exchange lives inside `jit`/`shard_map` and XLA can overlap the
payload collective with independent local compute.  This is the structural
equivalent of ring-attention's KV halo exchange, applied to neighborhoods
(SURVEY §5 long-context row).

Host-side planning is numpy (amortized per batch); device-side execution is
pure collectives — the NCCL-equivalent here is XLA's compiled all_to_all
over ICI, per the TPU-native obligation (SURVEY §2b comm backend row).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def partition_bounds(num_nodes: int, n_dev: int) -> int:
    """Rows per shard (contiguous ranges; last shard padded)."""
    return (num_nodes + n_dev - 1) // n_dev


def shard_features(feats: np.ndarray, n_dev: int) -> np.ndarray:
    """Pad the feature table to n_dev equal contiguous row shards:
    [n_dev * rows_per, D]."""
    rows_per = partition_bounds(feats.shape[0], n_dev)
    out = np.zeros((n_dev * rows_per, feats.shape[1]), feats.dtype)
    out[:feats.shape[0]] = feats
    return out


@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Per-batch exchange plan (host-built, device-consumed).

    requests:  int32 [n_dev, n_dev, cap] — requests[r, o, :] are OWNER-LOCAL
               row ids device r needs from device o (pad slots = 0).
    addr_owner int32 [n_dev, b_loc] — owner index for each frontier slot.
    addr_slot  int32 [n_dev, b_loc] — slot in the received [n_dev, cap]
               buffer for each frontier slot.

    With ``exclude_self=True`` (default) self-owned slots bypass the
    exchange entirely: requests[r, r] stays empty, ``addr_local`` holds the
    local row for those slots and ``addr_is_local`` marks them.  The
    payload collective carries only true boundary rows (after a locality
    reorder, most slots are local), and XLA can overlap the all_to_all
    with the independent local gather.
    """
    requests: np.ndarray
    addr_owner: np.ndarray
    addr_slot: np.ndarray
    addr_is_local: np.ndarray   # float32/bool [n_dev, b_loc]
    addr_local: np.ndarray      # int32 [n_dev, b_loc]
    cap: int
    rows_per: int


def _bucket_cap(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def plan_halo(ids_per_dev: np.ndarray, num_nodes: int, n_dev: int,
              cap: int | None = None,
              exclude_self: bool = True) -> HaloPlan:
    """Build the exchange plan for per-device frontier id lists.

    ids_per_dev: int64/int32 [n_dev, b_loc] global node ids each device
    needs (duplicates fine — they collapse to one request slot).
    """
    ids_per_dev = np.asarray(ids_per_dev)
    n_dev_in, b_loc = ids_per_dev.shape
    assert n_dev_in == n_dev
    rows_per = partition_bounds(num_nodes, n_dev)

    owners = (ids_per_dev // rows_per).astype(np.int64)  # [n_dev, b_loc]
    local_rows = (ids_per_dev % rows_per).astype(np.int64)

    me = np.arange(n_dev)[:, None]
    addr_is_local = ((owners == me) & exclude_self)
    addr_local = np.where(addr_is_local, local_rows, 0).astype(np.int32)
    addr_owner = owners.astype(np.int32)
    addr_slot = np.zeros((n_dev, b_loc), np.int32)

    # One global sort instead of an n_dev² Python loop: the composite key
    # (requester, owner, local_row) is unique'd once — O(T log T) in the
    # total slot count T = n_dev·b_loc — and, because np.unique returns
    # sorted keys, entries of the same (requester, owner) group are
    # contiguous, so per-group slot numbers are a subtraction against the
    # group's start offset.
    requester = np.broadcast_to(np.arange(n_dev)[:, None],
                                owners.shape).astype(np.int64)
    key = (requester * n_dev + owners) * rows_per + local_rows
    sel = ~addr_is_local.reshape(-1)             # slots that go over the wire
    uniq, inv = np.unique(key.reshape(-1)[sel], return_inverse=True)
    group = uniq // rows_per                     # requester * n_dev + owner
    l_u = (uniq % rows_per).astype(np.int32)
    grp_ids, grp_start, grp_counts = np.unique(
        group, return_index=True, return_counts=True)
    start_of = np.zeros(n_dev * n_dev, np.int64)
    start_of[grp_ids] = grp_start
    slot_in_grp = (np.arange(len(uniq)) - start_of[group]).astype(np.int32)

    max_cap = int(grp_counts.max()) if len(grp_counts) else 1
    if cap is None:
        cap = _bucket_cap(max_cap)
    assert cap >= max_cap, (cap, max_cap)

    requests = np.zeros((n_dev, n_dev, cap), dtype=np.int32)
    requests[group // n_dev, group % n_dev, slot_in_grp] = l_u
    addr_slot.reshape(-1)[sel] = slot_in_grp[inv]
    return HaloPlan(requests=requests, addr_owner=addr_owner,
                    addr_slot=addr_slot,
                    addr_is_local=addr_is_local.astype(np.float32),
                    addr_local=addr_local, cap=cap, rows_per=rows_per)


def halo_gather_local(feats_local: jax.Array, requests: jax.Array,
                      addr_owner: jax.Array, addr_slot: jax.Array,
                      addr_is_local: jax.Array | None = None,
                      addr_local: jax.Array | None = None,
                      axis_name: str = "data") -> jax.Array:
    """Per-shard body (call inside shard_map): returns [b_loc, D] features
    for this device's frontier slots.

    feats_local: [rows_per, D] — this device's feature rows.
    requests:    [n_dev, cap]  — owner-local rows this device requests of
                                 each owner.
    addr_is_local/addr_local (from exclude_self planning): slots owned by
    this device read feats_local directly — the gather is independent of
    the collectives, so XLA can overlap them.
    """
    # 1. ship request tables: after all_to_all, row r holds what device r
    #    wants from *this* device.
    to_serve = jax.lax.all_to_all(requests, axis_name, split_axis=0,
                                  concat_axis=0, tiled=False)  # [n_dev, cap]
    # 2. serve from the local shard and ship payloads back.
    served = jnp.take(feats_local, to_serve, axis=0)        # [n_dev, cap, D]
    recv = jax.lax.all_to_all(served, axis_name, split_axis=0,
                              concat_axis=0, tiled=False)   # [n_dev, cap, D]
    # 3. assemble: flat gather out of the received buffer.
    cap = requests.shape[1]
    flat = recv.reshape(-1, recv.shape[-1])                 # [n_dev*cap, D]
    remote = jnp.take(flat, addr_owner * cap + addr_slot, axis=0)
    if addr_is_local is None:
        return remote
    local = jnp.take(feats_local, addr_local, axis=0)
    return jnp.where(addr_is_local[:, None].astype(bool), local, remote)


def make_halo_gather(mesh: Mesh, axis_name: str = "data"):
    """shard_map-wrapped gather: (feats_sharded [N_pad, D] P(data, None),
    requests [n_dev, n_dev, cap] P(data), addr_owner/addr_slot
    [n_dev, b_loc] P(data)) -> [n_dev * b_loc, D] P(data)."""

    def body(feats_local, requests, addr_owner, addr_slot, addr_is_local,
             addr_local):
        out = halo_gather_local(feats_local, requests[0], addr_owner[0],
                                addr_slot[0], addr_is_local[0],
                                addr_local[0], axis_name)
        return out  # [b_loc, D]; shard_map concatenates over devices

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None, None),
                  P(axis_name, None), P(axis_name, None),
                  P(axis_name, None), P(axis_name, None)),
        out_specs=P(axis_name, None),
    )
