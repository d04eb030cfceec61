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
