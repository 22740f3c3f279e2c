"""graphsage_tpu — a TPU-native GraphSAGE framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capabilities of the reference PyTorch GraphSAGE
repo (Lolash/graphSAGE-pytorch): sample-and-aggregate GNN training with
mean / max-pool / LSTM aggregators, supervised and unsupervised (normal
negative-sampling and margin) objectives, built TPU-first:

- graphs compile to fixed-shape padded CSR gather tables (no Python-set
  sampling on the hot path; cf. reference src/models.py:277-289),
- aggregation is a padded segment-reduce expressed as masked matmuls /
  Pallas kernels that map onto the MXU (cf. reference src/models.py:291-330),
- the whole training step (sampling + forward + loss + grad + SGD) is one
  `jax.jit` region with static shapes,
- scaling is done with `jax.sharding.Mesh` + `shard_map` collectives,
  not host-side loops.

Package layout:
  data/      loaders (cora, pubmed, synthetic power-law), split, graph compiler
  ops/       aggregation kernels: XLA reference ops + Pallas TPU kernels
  models/    SageLayer, GraphSage encoder, classifier head, LSTM aggregator
  sampler/   device-side neighbor sampling, random-walk positives, negatives
  train/     training loops (sup / unsup / plus_unsup), evaluation protocol
  parallel/  device mesh, data/edge partitioning, halo exchange
  infer.py   deterministic full-graph inference + serving bundles
  utils/     config, metrics, checkpointing (orbax), logging
"""

__version__ = "0.1.0"
