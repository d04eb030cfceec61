"""Diagnose the churn recall regression from within-batch insert linking."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alayalite_tpu import Index, IndexParams
from alayalite_tpu.utils.datasets import random_dataset
from alayalite_tpu.utils.evaluate import calc_recall

N, DIM = 900, 16


def run():
    n = N
    ds = random_dataset(n=n, dim=DIM, n_queries=16, seed=9)
    idx = Index("t", IndexParams(index_type="hnsw", capacity=3 * n,
                                 max_nbrs=16, ef_construction=64,
                                 compaction_threshold=0.15))
    idx.fit(ds.data)
    rng = np.random.default_rng(1)
    all_vecs = {i: ds.data[i] for i in range(n)}
    live = set(range(n))
    batch_ids_all = []
    for round_ in range(3):
        doomed = rng.choice(sorted(live), size=n // 10, replace=False)
        idx.remove(doomed.astype(np.int32))
        live -= set(int(x) for x in doomed)
        fresh = rng.normal(size=(n // 10, DIM)).astype(np.float32)
        new_ids = idx.insert(fresh)
        for j, nid in enumerate(np.asarray(new_ids)):
            all_vecs[int(nid)] = fresh[j]
            live.add(int(nid))
        batch_ids_all.append(np.asarray(new_ids))
        nbrs_now = np.asarray(idx._engine.graph.nbrs)
        fresh_now = np.concatenate(batch_ids_all)
        for bi, b in enumerate(batch_ids_all):
            rows = nbrs_now[b]
            okm = rows >= 0
            print(f"  after round {round_}: batch {bi} deg={okm.sum(1).mean():.1f} "
                  f"fresh_frac={np.isin(rows[okm], fresh_now).mean():.3f}")
    live_ids = np.asarray(sorted(live), dtype=np.int64)
    base = np.stack([all_vecs[int(i)] for i in live_ids])
    d2 = ((ds.queries[:, None, :] - base[None]) ** 2).sum(-1)
    gt = live_ids[np.argsort(d2, axis=1)[:, :10]]
    ids = idx.batch_search(ds.queries, 10, ef_search=96)
    rec = calc_recall(ids, gt.astype(np.int64))

    # edge composition of fresh nodes: fraction pointing at other fresh ids
    eng = idx._engine
    nbrs = np.asarray(eng.graph.nbrs)
    fresh_set = np.concatenate(batch_ids_all)
    comp = []
    for bi, b in enumerate(batch_ids_all):
        rows = nbrs[b]
        okm = rows >= 0
        frac_fresh = np.isin(rows[okm], fresh_set).mean()
        deg = okm.sum(1).mean()
        comp.append((bi, float(deg), float(frac_fresh)))
    # how many fresh ids appear in GT at all
    gt_fresh = np.isin(gt, fresh_set).mean()
    # recall split: rows whose gt contains a fresh id vs not
    has_fresh = np.isin(gt, fresh_set).any(axis=1)
    r_f = calc_recall(ids[has_fresh], gt[has_fresh].astype(np.int64)) if has_fresh.any() else -1
    r_o = calc_recall(ids[~has_fresh], gt[~has_fresh].astype(np.int64)) if (~has_fresh).any() else -1
    print(f"ISOLATE={os.environ.get('ALAYA_ISOLATE','-')} recall={rec:.4f} "
          f"gt_fresh_frac={gt_fresh:.3f} rec(gt has fresh)={r_f:.4f} "
          f"rec(gt no fresh)={r_o:.4f}")
    for bi, deg, ff in comp:
        print(f"  batch {bi}: mean_deg={deg:.1f} frac_edges_to_fresh={ff:.3f}")


if __name__ == "__main__":
    run()
