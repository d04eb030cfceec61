"""Occlusion-slack (params.prune_alpha) plumbing: the DiskANN-style
alpha generalization of the reference's MRNG heuristic
(include/index/graph/hnsw/hnsw_builder.hpp prune rule; alpha=1 is
reference-exact). High ambient dim over-prunes at alpha=1 — the GIST-960
frontier work (results/gist960_frontier.json) motivates the knob."""

import numpy as np

from alayalite_tpu import Index, IndexParams
from alayalite_tpu.utils.datasets import random_dataset
from alayalite_tpu.utils.evaluate import calc_gt, calc_recall
import pytest

pytestmark = pytest.mark.slow  # >100 s on a 1-core host


def _degrees(idx):
    nbrs = np.asarray(idx._engine.graph.nbrs)
    n = int(idx._engine.space.num)
    return (nbrs[:n] >= 0).sum(axis=1)


def test_alpha_slack_keeps_denser_rows_and_recall():
    n, dim = 2000, 96
    d = random_dataset(n=n, dim=dim, n_queries=64, seed=5, clusters=24)
    gt = calc_gt(d.data, d.queries, 10)

    recs, mean_deg = {}, {}
    for alpha in (1.0, 1.25):
        idx = Index(f"a{alpha}", IndexParams(
            index_type="hnsw", capacity=n, max_nbrs=16,
            ef_construction=96, prune_alpha=alpha))
        idx.fit(d.data)
        ids = idx.batch_search(d.queries, 10, ef_search=48)
        recs[alpha] = calc_recall(ids, gt)
        mean_deg[alpha] = float(_degrees(idx).mean())
        assert recs[alpha] >= 0.85, f"alpha={alpha} recall {recs[alpha]}"

    # slack strictly relaxes the occlusion predicate -> denser rows
    # (fill_degree backfill can mask small deltas; require non-degenerate)
    assert mean_deg[1.25] >= mean_deg[1.0] - 0.5, mean_deg
    # and must not collapse recall
    assert recs[1.25] >= recs[1.0] - 0.03, recs


def test_prune_alpha_round_trips_schema():
    p = IndexParams(capacity=100, prune_alpha=1.2)
    q = IndexParams.from_json(p.to_json())
    assert q.prune_alpha == 1.2
