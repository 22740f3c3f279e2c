"""Measure the reference implementation's supervised train-step throughput
(torch CPU) on the real Cora graph, batch 20, 2-layer MEAN, fanout 10.
Runs the reference code unmodified from the read-only mount."""
import importlib.util, sys, time
from collections import defaultdict
import numpy as np
import torch

spec = importlib.util.spec_from_file_location("ref_models", "/root/reference/src/models.py")
ref = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ref)

# Python >=3.11 removed random.sample(set); the reference relies on it
# (src/models.py:282). Shim it for this measurement process only.
import random as _random
_orig_sample = _random.sample
def _sample(pop, k):
    if isinstance(pop, (set, frozenset)):
        pop = sorted(pop)
    return _orig_sample(pop, k)
_random.sample = _sample
ref.random.sample = _sample

# real cora graph
sys.path.insert(0, "/root/repo")
from graphsage_tpu.data import load_cora
ds = load_cora()
adj = defaultdict(set)
g = ds.graph
for v in range(g.num_nodes):
    adj[v] = set(int(x) for x in g.neighbors(v))

feats = torch.FloatTensor(ds.features)
device = torch.device("cpu")
gs = ref.GraphSage(2, 1433, 128, feats, adj, device, gcn=False, agg_func="MEAN")
clf = ref.Classification(128, 7)
labels = torch.LongTensor(ds.labels.astype(np.int64))
params = [p for m in (gs, clf) for p in m.parameters()]
opt = torch.optim.SGD(params, lr=0.7)

rng = np.random.RandomState(0)
B = 20
def step(nodes):
    embs = gs(nodes)
    logists = clf(embs)
    loss = -torch.sum(logists[range(logists.size(0)), labels[nodes]], 0) / len(nodes)
    loss.backward()
    for m in (gs, clf):
        torch.nn.utils.clip_grad_norm_(m.parameters(), 5)
    opt.step(); opt.zero_grad()
    return float(loss)

# warmup
for _ in range(3):
    step(rng.choice(ds.num_nodes, B, replace=False).tolist())
N = 30
t0 = time.time()
for _ in range(N):
    step(rng.choice(ds.num_nodes, B, replace=False).tolist())
dt = (time.time() - t0) / N
# edge accounting (same formula as graphsage_tpu.train.dense.edges_per_batch)
K = 10
edges = B*K + B*(K+1)*K
print(f"reference torch-cpu: {dt*1000:.1f} ms/step, batch={B}, edges/step={edges}")
print(f"edges_per_sec={edges/dt:.0f}")

# also measure MAX aggregator
gs2 = ref.GraphSage(2, 1433, 128, feats, adj, device, gcn=False, agg_func="MAX")
opt2 = torch.optim.SGD([p for m in (gs2, clf) for p in m.parameters()], lr=0.7)
def step2(nodes):
    embs = gs2(nodes)
    logists = clf(embs)
    loss = -torch.sum(logists[range(logists.size(0)), labels[nodes]], 0) / len(nodes)
    loss.backward()
    opt2.step(); opt2.zero_grad()
for _ in range(2): step2(rng.choice(ds.num_nodes, B, replace=False).tolist())
t0=time.time()
for _ in range(10): step2(rng.choice(ds.num_nodes, B, replace=False).tolist())
dt2=(time.time()-t0)/10
print(f"reference MAX: {dt2*1000:.1f} ms/step, edges_per_sec={edges/dt2:.0f}")
