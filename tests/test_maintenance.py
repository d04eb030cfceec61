"""Long-lived index maintenance: overlay-extending insert, per-node update,
tombstone compaction, and insert/remove churn.

Reference analogs: hnswlib.hpp:652-750 (add_point links layers > 0 with
P(level >= l) = R^-l), graph_update_job.hpp:105-137 (update() re-selects a
node's edges through removed neighbors' 2-hop lists), and
tests/executor/update_test.cpp:48-110 (churn holds recall vs deleted-set GT).
"""

import numpy as np

from alayalite_tpu import Index, IndexParams
from alayalite_tpu.index.overlay_update import draw_levels
from alayalite_tpu.utils.datasets import random_dataset
from alayalite_tpu.utils.evaluate import calc_gt, calc_recall
import pytest

pytestmark = pytest.mark.slow  # >100 s on a 1-core host

N, DIM = 1200, 16


def _overlay_occupancy(graph):
    return [int((np.asarray(l.ids) >= 0).sum()) for l in graph.overlay]


def test_draw_levels_matches_reference_law():
    rng = np.random.default_rng(0)
    lv = draw_levels(rng, 200_000, r=16, max_level=8)
    # P(level >= 1) = 1/16
    frac = float((lv >= 1).mean())
    assert abs(frac - 1 / 16) < 0.005, frac
    frac2 = float((lv >= 2).mean())
    assert abs(frac2 - 1 / 256) < 0.002, frac2


def test_insert_extends_overlay():
    ds = random_dataset(n=N, dim=DIM, n_queries=8, seed=5)
    idx = Index("t", IndexParams(index_type="hnsw", capacity=N + 512,
                                 max_nbrs=8, ef_construction=64))
    idx.fit(ds.data)
    eng = idx._engine
    assert len(eng.graph.overlay) >= 1
    occ0 = _overlay_occupancy(eng.graph)
    # levels are padded to capacity scale -> free slots exist
    assert np.asarray(eng.graph.overlay[-1].ids).shape[0] > occ0[-1]
    rng = np.random.default_rng(11)
    # in-distribution inserts (perturbed copies): this test exercises the
    # overlay mechanics, not outlier reachability
    new = (ds.data[rng.integers(0, N, size=256)]
           + 0.05 * rng.normal(size=(256, DIM)).astype(np.float32))
    new_ids = idx.insert(new)
    assert (np.asarray(new_ids) >= 0).all()
    occ1 = _overlay_occupancy(eng.graph)
    # with r=8, P(level>=1)=1/8: 256 inserts -> ~32 overlay additions
    assert occ1[-1] > occ0[-1], (occ0, occ1)
    # overlay invariants: occupied slots' down pointers resolve; local
    # neighbor indices point at occupied slots
    for li, lvl in enumerate(eng.graph.overlay):
        ids = np.asarray(lvl.ids)
        nbrs = np.asarray(lvl.nbrs)
        down = np.asarray(lvl.down)
        occ = np.flatnonzero(ids >= 0)
        tgt = nbrs[occ]
        assert (ids[tgt[tgt >= 0]] >= 0).all(), f"level {li} edge to free slot"
        if li + 1 < len(eng.graph.overlay):
            below = np.asarray(eng.graph.overlay[li + 1].ids)
            assert (below[down[occ]] == ids[occ]).all(), f"level {li} down"
        else:
            assert (down[occ] == ids[occ]).all()
    # the index still searches fine end-to-end
    ids = idx.batch_search(new[:16], 5, ef_search=64)
    hit = np.mean([new_ids[i] in ids[i] for i in range(16)])
    assert hit >= 0.9, hit


def test_overlay_full_level_degrades_gracefully():
    """When an overlay level runs out of pre-padded slots, truncated nodes
    must degrade to the levels they did reach — not crash with KeyError when
    a higher level still has room (round-2 advisor, overlay_update.py:111).
    Forces every insert to draw the max level so the tight bottom level
    (capacity barely above n) truncates while the top level has free slots."""
    n = 600
    ds = random_dataset(n=n, dim=DIM, n_queries=4, seed=21)
    idx = Index("full", IndexParams(index_type="hnsw", capacity=n + 40,
                                    max_nbrs=8, ef_construction=48))
    idx.fit(ds.data)
    eng = idx._engine
    assert len(eng.graph.overlay) >= 2

    class _MaxLevelRng:
        def uniform(self, low=0.0, size=None):
            return np.full(size, 1e-12)

    eng._rng = _MaxLevelRng()
    rng = np.random.default_rng(3)
    new = (ds.data[rng.integers(0, n, size=32)]
           + 0.05 * rng.normal(size=(32, DIM)).astype(np.float32))
    new_ids = idx.insert(new)  # KeyError before the fix
    assert (np.asarray(new_ids) >= 0).all()
    # every occupied slot's down pointer still resolves level-to-level
    for li, lvl in enumerate(eng.graph.overlay):
        ids = np.asarray(lvl.ids)
        down = np.asarray(lvl.down)
        occ = np.flatnonzero(ids >= 0)
        if li + 1 < len(eng.graph.overlay):
            below = np.asarray(eng.graph.overlay[li + 1].ids)
            assert (below[down[occ]] == ids[occ]).all(), f"level {li} down"
        else:
            assert (down[occ] == ids[occ]).all()
    ids = idx.batch_search(new[:8], 5, ef_search=64)
    hit = np.mean([new_ids[i] in ids[i] for i in range(8)])
    assert hit >= 0.8, hit


def test_outlier_batch_insert_reachable():
    """A co-located batch of OUTLIERS must stay reachable after one insert
    call: searched edges anchor the island to the graph and the capped
    within-batch mates (fused_insert.fused_raw_connect) link it internally.
    The reference gets both for free from sequential insert — point t links
    to points < t (graph_update_job.hpp:66-89). Measured without the
    within-batch edges: 0.15 self-recall on a 40-outlier batch."""
    ds = random_dataset(n=N, dim=DIM, n_queries=4, seed=13)
    idx = Index("t", IndexParams(index_type="hnsw", capacity=N + 64,
                                 max_nbrs=16, ef_construction=64))
    idx.fit(ds.data)
    rng = np.random.default_rng(7)
    out = (20.0 + 0.5 * rng.normal(size=(40, DIM))).astype(np.float32)
    new_ids = np.asarray(idx.insert(out))
    assert (new_ids >= 0).all()
    q = (out[:16] + 0.05 * rng.normal(size=(16, DIM))).astype(np.float32)
    all_data = np.concatenate([ds.data, out])
    all_ids = np.concatenate([np.arange(N), new_ids]).astype(np.int64)
    d2 = ((q[:, None] - all_data[None]) ** 2).sum(-1)
    gt = all_ids[np.argsort(d2, axis=1)[:, :10]]
    ids = idx.batch_search(q, 10, ef_search=96)
    rec = calc_recall(ids, gt)
    assert rec >= 0.8, f"outlier-batch recall {rec}"


def test_extend_overlay_device_matches_host(monkeypatch):
    """The one-dispatch device overlay link (_extend_overlay_dev) reproduces
    the host path's linking semantics: same level membership, same down
    chains, same search behavior. (The device path exists because the host
    loop costs 50-100 eager dispatches per insert batch — 21-37 s through a
    TPU tunnel.)"""
    ds = random_dataset(n=N, dim=DIM, n_queries=8, seed=17)
    got = {}
    for mode in ("1", ""):
        monkeypatch.setenv("ALAYA_OVERLAY_HOST", mode)
        idx = Index(f"t{mode}", IndexParams(index_type="hnsw",
                                            capacity=N + 512, max_nbrs=8,
                                            ef_construction=64))
        idx.fit(ds.data)
        idx._engine._rng = np.random.default_rng(42)  # same level draws
        new = (ds.data[:256] + 0.05 * np.random.default_rng(5)
               .normal(size=(256, DIM)).astype(np.float32))
        new_ids = np.asarray(idx.insert(new))
        hits = idx.batch_search(new[:32], 5, ef_search=64)
        hit = np.mean([new_ids[i] in hits[i] for i in range(32)])
        got[mode] = ([np.asarray(l.ids) for l in idx._engine.graph.overlay],
                     [np.asarray(l.down) for l in idx._engine.graph.overlay],
                     hit)
    ids_h, down_h, hit_h = got["1"]
    ids_d, down_d, hit_d = got[""]
    for li in range(len(ids_h)):
        assert set(ids_h[li][ids_h[li] >= 0]) == set(ids_d[li][ids_d[li] >= 0]), li
        occ = np.flatnonzero(ids_d[li] >= 0)
        if li + 1 < len(ids_d):
            below = ids_d[li + 1]
            assert (below[down_d[li][occ]] == ids_d[li][occ]).all(), li
        else:
            assert (down_d[li][occ] == ids_d[li][occ]).all()
    assert hit_d >= 0.9 and hit_h >= 0.9, (hit_h, hit_d)


def test_seed_sample_survives_roundtrip(tmp_path):
    """seed_sample (and search_iters) persist through save/load — a tuned
    0 value must not silently reset to 4096 (round-2 advisor, params.py)."""
    p = IndexParams(index_type="hnsw", capacity=512, max_nbrs=8,
                    seed_sample=0, search_iters=6)
    q = IndexParams.from_json(p.to_json())
    assert q.seed_sample == 0 and q.search_iters == 6


def test_update_nodes_rewires_through_removed():
    ds = random_dataset(n=N, dim=DIM, n_queries=16, seed=6)
    idx = Index("t", IndexParams(index_type="hnsw", capacity=N, max_nbrs=16,
                                 ef_construction=64,
                                 compaction_threshold=0.0))  # manual only
    idx.fit(ds.data)
    eng = idx._engine
    removed = np.arange(0, N, 5, dtype=np.int32)
    idx.remove(removed)
    nbrs_before = np.asarray(eng.graph.nbrs)
    affected = np.flatnonzero(np.isin(nbrs_before, removed).any(axis=1))
    eng.compact()
    nbrs_after = np.asarray(eng.graph.nbrs)
    # compaction removed every tombstoned id from live nodes' rows
    live_rows = nbrs_after[np.setdiff1d(np.arange(N), removed)]
    assert not np.isin(live_rows, removed).any()
    assert affected.size > 0
    gt = calc_gt(ds.data, ds.queries, 10, deleted=removed)
    ids = idx.batch_search(ds.queries, 10, ef_search=80)
    assert calc_recall(ids, gt) >= 0.8


def test_churn_30pct_holds_recall():
    """30% churn (reference update_test.cpp:48-110): remove a third of the
    points, insert replacements, repeat; recall vs live-set GT stays >= 0.8
    and results never contain a removed id."""
    n = 900
    ds = random_dataset(n=n, dim=DIM, n_queries=16, seed=9)
    idx = Index("t", IndexParams(index_type="hnsw", capacity=3 * n,
                                 max_nbrs=16, ef_construction=64,
                                 compaction_threshold=0.15))
    idx.fit(ds.data)
    rng = np.random.default_rng(1)
    all_vecs = {i: ds.data[i] for i in range(n)}
    live = set(range(n))
    for round_ in range(3):
        doomed = rng.choice(sorted(live), size=n // 10, replace=False)
        idx.remove(doomed.astype(np.int32))
        live -= set(int(x) for x in doomed)
        fresh = rng.normal(size=(n // 10, DIM)).astype(np.float32)
        new_ids = idx.insert(fresh)
        assert (np.asarray(new_ids) >= 0).all()
        for j, nid in enumerate(np.asarray(new_ids)):
            all_vecs[int(nid)] = fresh[j]
            live.add(int(nid))
    live_ids = np.asarray(sorted(live), dtype=np.int64)
    base = np.stack([all_vecs[int(i)] for i in live_ids])
    d2 = ((ds.queries[:, None, :] - base[None]) ** 2).sum(-1)
    gt = live_ids[np.argsort(d2, axis=1)[:, :10]]
    ids = idx.batch_search(ds.queries, 10, ef_search=96)
    dead = np.setdiff1d(np.arange(idx._engine.num), live_ids)
    assert not np.isin(ids[ids >= 0], dead).any()
    rec = calc_recall(ids, gt.astype(np.int64))
    assert rec >= 0.8, f"churn recall {rec}"
