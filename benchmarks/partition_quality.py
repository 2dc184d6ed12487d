"""Partitioner quality: per-shard nnz spread + halo volume, by strategy.

Round 2 (VERDICT r1 #5) established nnz balancing; round 3 (VERDICT r2 #3)
adds the ``reorder='cluster'`` community partitioner and the measured
decomposition of WHY BA halo volume cannot be cut much further by any
vertex partition. Per (graph, strategy):

  - nnz_imbalance = max-shard nnz / mean-shard nnz (1.0 = perfect)
  - E (static edge width actually allocated)
  - halo_pad_ratio = allocated ppermute slots / real halo entries
  - halo_total = real halo entries (rows received per SpMM step, summed
    over shards); with the bf16 carry mode the WIRE BYTES are half of
    4·S_signals·halo_total.

Plus, for the BA graph, the analysis rows:
  - halo pairs by column-degree bucket (who the volume belongs to)
  - hub-replication net saving at several degree thresholds: replicating
    vertices of degree ≥ T (allgather of their values each step, S-1
    receives each) vs the halo pairs they currently cost — measured ≈ 0
    for every T: hubs are already in every shard's halo, so broadcast
    moves the same bytes. The remaining volume sits in low-degree
    columns, which on an expander no vertex partition can localize —
    the round-3 volume lever is therefore the bf16 halo payload
    (sharded_cheby_op carry_dtype), halving bytes at equal pairs.

Run on CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python
benchmarks/partition_quality.py [--quick]. Writes PARTITION_r3.json rows.
"""

import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analyze(W, n_shards, balance, reorder):
    from pygsp_tpu.parallel.partition import partition_graph
    t0 = time.time()
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
        partition_s=round(time.time() - t0, 1),
        halo_dists=list(sg.halo_dists), halo_sizes=list(sg.halo_sizes))


def ba_halo_decomposition(W, n_shards):
    """Halo pairs by column degree + hub-replication net saving, under
    the contiguous nnz-balanced partition (the deployed default)."""
    N = W.shape[0]
    indptr, indices = W.indptr, W.indices
    deg = np.diff(indptr).astype(np.int64)
    rows = np.repeat(np.arange(N, dtype=np.int64), deg)
    cum = np.cumsum(deg + 1)
    targets = cum[-1] / n_shards * np.arange(1, n_shards)
    bounds = np.concatenate([[0], np.searchsorted(cum, targets), [N]])
    labels = np.zeros(N, np.int32)
    for s in range(n_shards):
        labels[bounds[s]:bounds[s + 1]] = s
    sr = labels[rows]
    mask = sr != labels[indices]
    pairs = np.unique(sr[mask].astype(np.int64) * N + indices[mask])
    dcols = deg[pairs % N]
    total = int(len(pairs))
    buckets = {}
    for lo, hi in [(0, 16), (16, 32), (32, 64), (64, 128), (128, 512),
                   (512, 1 << 62)]:
        m = int(((dcols >= lo) & (dcols < hi)).sum())
        buckets[f'deg_{lo}_{hi if hi < (1 << 62) else "inf"}'] = {
            'pairs': m, 'share': round(m / total, 4)}
    hub = {}
    for T in (32, 64, 128, 256):
        nH = int((deg >= T).sum())
        saved = int((dcols >= T).sum())
        cost = (n_shards - 1) * nH
        hub[f'T_{T}'] = {'hubs': nH, 'halo_pairs_saved': saved,
                         'allgather_cost': cost, 'net': saved - cost}
    return {'tag': 'ba_halo_decomposition', 'n_shards': n_shards,
            'halo_total': total, 'by_degree': buckets,
            'hub_replication_net': hub,
            'note': 'net<=0 for all T: hub replication is volume-neutral '
                    '(hubs already sit in every halo); low-degree columns '
                    'dominate and are unlocalizable on an expander — '
                    'bytes, not pairs, are the remaining lever '
                    '(carry_dtype=bfloat16 halves them).'}


def main():
    quick = '--quick' in sys.argv
    n = 1 << (16 if quick else 20)
    results = []

    def emit(r):
        results.append(r)
        print(json.dumps(r), flush=True)

    # BA power-law graph
    from pygsp_tpu.graphs.barabasialbert import ba_edges_fast
    src, tgt = ba_edges_fast(n, m0=8, m=8, seed=42)
    W = sps.csr_matrix(
        (np.ones(2 * len(src), np.float32),
         (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
        shape=(n, n))
    W.data[:] = 1.0
    W.sum_duplicates()
    for balance, reorder in (('vertex', 'none'), ('nnz', 'none'),
                             ('nnz', 'cluster')):
        r = analyze(W, 8, balance, reorder)
        r['graph'] = f'ba_{n}'
        emit(r)
    emit(ba_halo_decomposition(W, 8))

    # SBM community graph — two vertex orders:
    # (a) sorted by community (contiguous split is already block-local),
    # (b) SHUFFLED ids (arbitrary order — the case 'cluster' exists for)
    from pygsp_tpu.graphs.stochasticblockmodel import sbm_edges
    ns = 1 << (14 if quick else 20)
    k = 32
    p = 12.0 / (ns / k)
    q = p / 50
    M = np.full((k, k), q)
    np.fill_diagonal(M, p)
    for tag, z in (('sorted', np.sort(np.arange(ns) % k)),
                   ('shuffled',
                    np.random.default_rng(5).integers(0, k, ns))):
        rows, cols = sbm_edges(z, M, rng=np.random.default_rng(1))
        Ws = sps.csr_matrix(
            (np.ones(2 * len(rows), np.float32),
             (np.concatenate([rows, cols]), np.concatenate([cols, rows]))),
            shape=(ns, ns))
        Ws.sum_duplicates()
        strategies = [('nnz', 'none'), ('nnz', 'cluster')]
        if tag == 'sorted':
            strategies.insert(0, ('vertex', 'none'))
        for balance, reorder in strategies:
            r = analyze(Ws, 8, balance, reorder)
            r['graph'] = f'sbm_{ns}_{tag}'
            emit(r)
        # oracle (true membership) for the shuffled case
        if tag == 'shuffled':
            deg = np.diff(Ws.indptr).astype(np.int64)
            rr = np.repeat(np.arange(ns, dtype=np.int64), deg)
            sh = (z // (k // 8)).astype(np.int32)
            sr = sh[rr]
            msk = sr != sh[Ws.indices]
            halo = int(np.unique(sr[msk].astype(np.int64) * ns
                                 + Ws.indices[msk]).size)
            load = np.bincount(sh, weights=deg.astype(np.float64),
                               minlength=8)
            emit({'graph': f'sbm_{ns}_{tag}', 'reorder': 'oracle',
                  'halo_total': halo,
                  'nnz_imbalance': float(load.max() / load.mean())})

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'PARTITION_r3.json'), 'w') as f:
        json.dump(results, f, indent=1)


if __name__ == '__main__':
    main()
