"""NN-Descent graph quality — analog of the reference's knng tests
(nndescent builds must converge to a high-recall kNN graph)."""

import numpy as np

from alayalite_tpu.index.knn import exact_knn
from alayalite_tpu.index.nndescent import build_knn_graph
from alayalite_tpu.spaces.raw import RawSpace
from alayalite_tpu.utils.datasets import random_dataset


def test_nndescent_converges_to_exact_knn():
    """At builder-scale sampling (k=32 → s1=16, s2=8) the rounds converge
    quickly; tiny k converges too but needs more rounds (documented)."""
    ds = random_dataset(n=6000, dim=24, n_queries=0, seed=9)
    space = RawSpace.create(6000, 24).fit(ds.data)
    k = 32
    _, approx = build_knn_graph(space, 6000, k, max_iters=16,
                                exact_threshold=1000)  # force the nnd path
    _, exact = exact_knn(ds.data, k)
    hits = sum(len(set(approx[i].tolist()) & set(exact[i].tolist()))
               for i in range(6000))
    recall = hits / (6000 * k)
    assert recall >= 0.85, f"knn-graph recall {recall}"


def test_nndescent_chunked_matches_unchunked_shape():
    ds = random_dataset(n=5000, dim=16, n_queries=0, seed=2)
    space = RawSpace.create(5000, 16).fit(ds.data)
    d, i = build_knn_graph(space, 5000, 8, max_iters=4, exact_threshold=100)
    assert i.shape == (5000, 8)
    assert (i != np.arange(5000)[:, None]).all()  # never self
    assert (np.diff(d, axis=1) >= -1e-5).all()     # sorted ascending


def test_nndescent_multi_chunk_rounds():
    """Chunked rounds (the 1M-scale path) must match single-chunk quality."""
    ds = random_dataset(n=5000, dim=16, n_queries=0, seed=4)
    space = RawSpace.create(5000, 16).fit(ds.data)
    k = 16
    _, multi = build_knn_graph(space, 5000, k, max_iters=12,
                               exact_threshold=100, chunk=1024)  # 5 chunks
    _, exact = exact_knn(ds.data, k)
    hits = sum(len(set(multi[i].tolist()) & set(exact[i].tolist()))
               for i in range(5000))
    assert hits / (5000 * k) >= 0.8, hits / (5000 * k)


def test_cluster_init_plus_refinement():
    """Cluster-based init (the >100k path) + a few refine rounds must reach
    the quality random init needs ~log n rounds for."""
    import jax

    from alayalite_tpu.index.nndescent import _init_cluster_knn, _nnd_round

    ds = random_dataset(n=4000, dim=16, n_queries=0, seed=5)
    space = RawSpace.create(4000, 16).fit(ds.data)
    k = 16
    kd, ki = _init_cluster_knn(space, 4000, k, seed=0, chunk=2048)
    assert (np.asarray(ki) != np.arange(4000)[:, None]).all()
    key = jax.random.PRNGKey(1)
    for _ in range(8):
        key, sub = jax.random.split(key)
        kd, ki, _c = _nnd_round(space, kd, ki, sub, s1=8, s2=4, s_rev=8,
                                n_rand=4, chunk=2048)
    ki = np.asarray(ki)
    _, exact = exact_knn(ds.data, k)
    hits = sum(len(set(ki[i].tolist()) & set(exact[i].tolist()))
               for i in range(4000))
    assert hits / (4000 * k) >= 0.8, hits / (4000 * k)
