"""Device-resident connectivity repair vs the host reference behavior
(index/repair_dev.py; host analog nsg._attach_unreached)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from alayalite_tpu.index.repair_dev import (
    _attach_dev,
    _component_labels_dev,
    _expand_reached_dev,
    repair_connectivity_dev,
)

pytestmark = pytest.mark.slow  # >100 s on a 1-core host


def _host_reached(nbrs, ep):
    n = nbrs.shape[0]
    reached = np.zeros(n, dtype=bool)
    frontier = np.array([ep])
    reached[ep] = True
    while frontier.size:
        nxt = nbrs[frontier].reshape(-1)
        nxt = np.unique(nxt[nxt >= 0])
        nxt = nxt[~reached[nxt]]
        reached[nxt] = True
        frontier = nxt
    return reached


def _random_graph(n, r, seed, n_components=4):
    """Directed graph whose edges stay within one of n_components blocks."""
    rng = np.random.default_rng(seed)
    block = np.sort(rng.integers(0, n_components, n))
    nbrs = np.full((n, r), -1, np.int32)
    for b in range(n_components):
        ids = np.nonzero(block == b)[0]
        if ids.size < 2:
            continue
        nbrs[ids] = rng.choice(ids, size=(ids.size, r)).astype(np.int32)
    return nbrs, block


def test_expand_reached_matches_host_bfs():
    nbrs, _ = _random_graph(500, 4, seed=0)
    ep = 3
    seed_mask = jnp.zeros(500, bool).at[ep].set(True)
    dev = np.asarray(_expand_reached_dev(jnp.asarray(nbrs), seed_mask))
    np.testing.assert_array_equal(dev, _host_reached(nbrs, ep))


def test_component_labels_match_scipy():
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    nbrs, _ = _random_graph(400, 3, seed=1, n_components=6)
    mask = np.ones(400, dtype=bool)
    mask[::7] = False  # arbitrary non-members
    labels = np.asarray(_component_labels_dev(jnp.asarray(nbrs),
                                              jnp.asarray(mask)))
    # scipy ground truth on the same induced undirected subgraph
    src = np.repeat(np.arange(400), 3)
    dst = nbrs.reshape(-1)
    keep = (dst >= 0) & mask[src] & mask[np.clip(dst, 0, None)]
    m = coo_matrix((np.ones(keep.sum()), (src[keep], dst[keep])),
                   shape=(400, 400))
    _, ref = connected_components(m, directed=False)
    assert np.all(labels[~mask] == 400)
    # same partition: every device label is the min node id of its scipy
    # component (singletons included — they label themselves)
    for comp in np.unique(ref[mask]):
        ids = np.nonzero(mask & (ref == comp))[0]
        assert np.all(labels[ids] == ids.min())


def test_attach_prefers_empty_slots_and_never_self_clobbers():
    n, r = 32, 4
    nbrs = np.full((n, r), -1, np.int32)
    nbrs[5] = [1, -1, 2, -1]          # two empties at slots 1 and 3
    nbrs[9] = [1, 2, 3, 4]            # full row → clobber from the END
    reps = np.full(8192, n, np.int32)
    srcs = np.full(8192, -1, np.int32)
    reps[:5] = [10, 11, 12, 13, 14]
    srcs[:5] = [5, 5, 5, 9, 9]
    prot = jnp.zeros((n, r), jnp.bool_)
    out, prot = _attach_dev(jnp.asarray(nbrs), jnp.asarray(reps),
                            jnp.asarray(srcs), prot)
    out = np.asarray(out)
    row5 = out[5].tolist()
    # both empties used, third rep overflows into an occupied slot
    assert set(row5) >= {10, 11}
    assert 12 in row5
    assert len([x for x in row5 if x in (10, 11, 12)]) == 3
    row9 = out[9].tolist()
    # full row: worst (last) edges clobbered first, best edge kept
    assert row9 == [1, 2, 14, 13]
    assert np.asarray(prot)[5].sum() == 3 and np.asarray(prot)[9].sum() == 2
    # untouched rows stay untouched
    assert np.all(out[0] == -1)


def test_attach_cursor_preserves_prior_round_bridges():
    """A second round writing into the same full row must not clobber the
    first round's bridge (the 1M oscillation mode)."""
    n, r = 16, 4
    nbrs = np.full((n, r), -1, np.int32)
    nbrs[3] = [7, 8, 9, 10]
    reps = np.full(8192, n, np.int32)
    srcs = np.full(8192, -1, np.int32)
    reps[0] = 11
    srcs[0] = 3
    prot = jnp.zeros((n, r), jnp.bool_)
    out, prot = _attach_dev(jnp.asarray(nbrs), jnp.asarray(reps),
                            jnp.asarray(srcs), prot)
    assert np.asarray(out)[3].tolist() == [7, 8, 9, 11]
    reps2 = reps.copy(); reps2[0] = 12
    out2, prot = _attach_dev(out, jnp.asarray(reps2), jnp.asarray(srcs),
                             prot)
    # round-2 edge lands one slot earlier; round-1 bridge intact
    assert np.asarray(out2)[3].tolist() == [7, 8, 12, 11]


def test_attach_rounds_fill_remaining_empties_before_clobbering():
    """A row with 2+ empty slots attached across SUCCESSIVE rounds: the
    later round must take the remaining empty slot, not overwrite the
    earlier round's bridge (the cursor-over-shifting-permutation bug:
    once round 1's bridge flipped slot 2 to occupied-near-the-end, a
    cursor pos=1 into the recomputed permutation landed exactly on it)."""
    n, r = 16, 4
    nbrs = np.full((n, r), -1, np.int32)
    nbrs[3] = [7, 8, -1, -1]
    reps = np.full(8192, n, np.int32)
    srcs = np.full(8192, -1, np.int32)
    reps[0] = 11
    srcs[0] = 3
    prot = jnp.zeros((n, r), jnp.bool_)
    out, prot = _attach_dev(jnp.asarray(nbrs), jnp.asarray(reps),
                            jnp.asarray(srcs), prot)
    assert np.asarray(out)[3].tolist() == [7, 8, 11, -1]
    reps2 = reps.copy(); reps2[0] = 12
    out2, prot = _attach_dev(out, jnp.asarray(reps2), jnp.asarray(srcs),
                             prot)
    # the genuinely-empty slot 3 is used; round-1 bridge 11 intact
    assert np.asarray(out2)[3].tolist() == [7, 8, 11, 12]
    # a third round on the now-full row clobbers a BUILD edge (from the
    # end), never a bridge
    reps3 = reps.copy(); reps3[0] = 13
    out3, prot = _attach_dev(out2, jnp.asarray(reps3), jnp.asarray(srcs),
                             prot)
    assert np.asarray(out3)[3].tolist() == [7, 13, 11, 12]


@pytest.mark.parametrize("seed", [0, 1])
def test_device_repair_reaches_everything(seed):
    n = 3000
    nbrs, _ = _random_graph(n, 8, seed=seed, n_components=5)
    rng = np.random.default_rng(seed + 100)
    data = rng.normal(size=(n, 16)).astype(np.float32)

    from alayalite_tpu.spaces.raw import RawSpace

    space = RawSpace.create(capacity=n, dim=16)
    space = space.insert(data)[0]
    ep = 0
    out = np.asarray(repair_connectivity_dev(space, jnp.asarray(nbrs), ep))
    reached = _host_reached(out, ep)
    assert (~reached).sum() <= max(1, int(2e-4 * n))
    # repair only adds/replaces entries; ids stay in range
    assert out.max() < n and out.min() >= -1


def test_qg_build_with_device_repair_matches_recall():
    """Full bsq8 build with ALAYA_REPAIR=device vs host on the same data."""
    from alayalite_tpu import Index, IndexParams
    from alayalite_tpu.utils.datasets import random_dataset
    from alayalite_tpu.utils.evaluate import calc_gt, calc_recall

    ds = random_dataset(n=4000, dim=32, n_queries=128, seed=11, clusters=12)
    gt = calc_gt(ds.data, ds.queries, 10)
    recalls = {}
    for mode in ("host", "device"):
        os.environ["ALAYA_REPAIR"] = mode
        try:
            idx = Index(f"r_{mode}", IndexParams(
                index_type="hnsw", quantization_type="bsq8", capacity=4096,
                max_nbrs=32, ef_construction=200))
            idx.fit(ds.data)
            ids = idx.batch_search(ds.queries, 10, ef_search=64)
            recalls[mode] = calc_recall(ids, gt)
        finally:
            del os.environ["ALAYA_REPAIR"]
    assert recalls["device"] >= recalls["host"] - 0.01, recalls
