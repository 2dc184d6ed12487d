"""Partitioner quality: per-shard nnz spread + halo volume, by strategy.

VERDICT round-1 item 5: the uniform contiguous split put all hub rows of a
power-law graph in one shard and sized the static edge array E (max over
shards) by the worst shard. This reports, per (graph, balance strategy):

  - nnz_imbalance = max-shard nnz / mean-shard nnz (1.0 = perfect)
  - E (static edge width actually allocated)
  - halo_pad_ratio = allocated all_to_all slots / real halo entries
  - halo_total = real halo entries (communication volume per SpMM step)

Run on CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python
benchmarks/partition_quality.py [--quick]. Writes PARTITION_r2.json rows.
"""

import json
import os
import sys

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analyze(W, n_shards, balance, reorder):
    from pygsp_tpu.parallel.partition import partition_graph
    sg = partition_graph(W, n_shards, reorder=reorder, balance=balance,
                         dtype=np.float32)
    rows = np.asarray(sg.rows)
    n_local = sg.n_local
    real = rows < n_local
    nnz_per = real.sum(axis=1)
    real_send = sum(int((np.asarray(a) < n_local).sum())
                    for a in sg.send_idx)
    alloc_send = sum(int(np.asarray(a).size) for a in sg.send_idx)
    return dict(
        n_shards=n_shards, balance=balance, reorder=reorder,
        n_local=int(n_local), E=int(rows.shape[1]),
        nnz_imbalance=float(nnz_per.max() / max(nnz_per.mean(), 1)),
        halo_total=int(real_send), halo_alloc=int(alloc_send),
        halo_pad_ratio=float(alloc_send / max(real_send, 1)),
        halo_dists=list(sg.halo_dists), halo_sizes=list(sg.halo_sizes))


def main():
    quick = '--quick' in sys.argv
    n = 1 << (16 if quick else 20)
    results = []

    # BA power-law graph
    from pygsp_tpu.graphs.barabasialbert import ba_edges_fast
    src, tgt = ba_edges_fast(n, m0=8, m=8, seed=42)
    W = sps.csr_matrix(
        (np.ones(2 * len(src), np.float32),
         (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
        shape=(n, n))
    W.data[:] = 1.0
    W.sum_duplicates()
    for balance in ('vertex', 'nnz'):
        r = analyze(W, 8, balance, 'none')
        r['graph'] = f'ba_{n}'
        results.append(r)
        print(json.dumps(r), flush=True)

    # SBM community graph (sorted by community: contiguous is block-local)
    from pygsp_tpu.graphs.stochasticblockmodel import sbm_edges
    ns = 1 << (14 if quick else 20)
    k = 32
    z = np.sort(np.arange(ns) % k)
    p = 12.0 / (ns / k)
    q = p / 50
    M = np.full((k, k), q)
    np.fill_diagonal(M, p)
    rows, cols = sbm_edges(z, M, rng=np.random.default_rng(1))
    Ws = sps.csr_matrix(
        (np.ones(2 * len(rows), np.float32),
         (np.concatenate([rows, cols]), np.concatenate([cols, rows]))),
        shape=(ns, ns))
    Ws.sum_duplicates()
    for balance in ('vertex', 'nnz'):
        r = analyze(Ws, 8, balance, 'none')
        r['graph'] = f'sbm_{ns}'
        results.append(r)
        print(json.dumps(r), flush=True)

    with open('PARTITION_r2.json', 'w') as f:
        json.dump(results, f, indent=1)


if __name__ == '__main__':
    main()
