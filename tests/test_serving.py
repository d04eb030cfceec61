"""SearchServer: concurrent micro-batched serving over the native queue."""

import threading

import numpy as np
import pytest

from alayalite_tpu import Index, IndexParams
from alayalite_tpu.native import get_lib
from alayalite_tpu.serving import SearchServer
from alayalite_tpu.utils.datasets import random_dataset

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


def test_concurrent_search_correct():
    ds = random_dataset(n=500, dim=16, n_queries=0, seed=2)
    idx = Index("s", IndexParams(index_type="flat", capacity=500))
    idx.fit(ds.data)
    server = SearchServer(idx, topk=1, ef=10, max_batch=16, timeout_us=5000)
    results = {}

    def worker(lo, hi):
        for i in range(lo, hi):
            ids, dists = server.search(ds.data[i])
            results[i] = int(ids[0])

    threads = [threading.Thread(target=worker, args=(t * 10, t * 10 + 10))
               for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    server.close()
    assert all(results[i] == i for i in range(40)), results


def test_unfitted_server_rejected():
    idx = Index("u", IndexParams(index_type="flat", capacity=10))
    with pytest.raises(RuntimeError):
        SearchServer(idx)


def test_push_rejects_wrong_dimension():
    """BatchQueue.push memcpy's dim*4 bytes — a shorter vector must raise,
    not read out of bounds (regression: unvalidated heap read)."""
    from alayalite_tpu.native import BatchQueue

    q = BatchQueue(dim=16, capacity=32, max_batch=8, timeout_us=1000)
    try:
        with pytest.raises(ValueError, match="dimension"):
            q.push(0, np.ones(8, dtype=np.float32))
        with pytest.raises(ValueError, match="dimension"):
            q.push(0, np.ones((2, 16), dtype=np.float32))
        q.push(0, np.ones(16, dtype=np.float32))  # correct dim still works
    finally:
        q.close()


def test_error_propagates_to_all_waiters():
    """A batch whose search raises must fail every future in the batch,
    and the server must keep serving afterwards."""
    ds = random_dataset(n=100, dim=8, n_queries=0, seed=5)
    idx = Index("e", IndexParams(index_type="flat", capacity=100))
    idx.fit(ds.data)
    server = SearchServer(idx, topk=3, ef=10, max_batch=8, timeout_us=3000)
    try:
        orig = idx._engine.batch_search_with_distance
        calls = {"n": 0}

        def flaky(*a, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected failure")
            return orig(*a, **kw)

        idx._engine.batch_search_with_distance = flaky
        fut = server.submit(ds.data[0])
        with pytest.raises(RuntimeError, match="injected"):
            fut.result(timeout=10)
        ids, _ = server.search(ds.data[1])
        assert int(ids[0]) == 1
    finally:
        idx._engine.batch_search_with_distance = orig
        server.close()


def test_stress_concurrent_clients_with_error_and_close():
    """Stress tier: 8 client threads hammering the server while one batch
    errors mid-stream; then close() under load must fail (not hang) every
    still-pending request."""
    import time

    ds = random_dataset(n=400, dim=16, n_queries=0, seed=8)
    idx = Index("st", IndexParams(index_type="flat", capacity=400))
    idx.fit(ds.data)
    server = SearchServer(idx, topk=1, ef=10, max_batch=32, timeout_us=2000)
    orig = idx._engine.batch_search_with_distance
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("boom")
        return orig(*a, **kw)

    idx._engine.batch_search_with_distance = flaky
    ok, errs = [], []

    def client(t):
        for i in range(t * 20, t * 20 + 20):
            try:
                ids, _ = server.search(ds.data[i])
                ok.append((i, int(ids[0])))
            except RuntimeError:
                errs.append(i)

    threads = [threading.Thread(target=client, args=(t,)) for t in range(8)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert all(not t.is_alive() for t in threads)
        # every request either succeeded correctly or saw the injected error
        assert all(i == r for i, r in ok)
        assert len(ok) + len(errs) == 160
        assert calls["n"] >= 3  # the error actually fired
        # close under load: late submits fail fast, pending futures resolve
        futs = [server.submit(ds.data[i]) for i in range(8)]
        server.close()
        t0 = time.time()
        for f in futs:
            try:
                f.result(timeout=5)
            except RuntimeError:
                pass
        assert time.time() - t0 < 5, "close() left futures hanging"
        with pytest.raises(RuntimeError):
            server.submit(ds.data[0])
    finally:
        idx._engine.batch_search_with_distance = orig
        server.close()
