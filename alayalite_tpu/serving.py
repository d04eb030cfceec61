"""Online serving: concurrent micro-batching in front of the jitted search.

The reference serves concurrent queries by spawning one C++20 coroutine per
query on a pinned-worker Scheduler (/root/reference/include/executor/
scheduler.hpp:39-222, python/include/index.hpp:289-448). On TPU the
equivalent throughput machinery is a *batcher*: many client threads each
submit one query; the native C++ queue (alayalite_tpu/native) coalesces them
into a padded batch with bounded added latency; one dispatcher thread runs
the jitted batched search and scatters results back to per-request futures.
"""

from __future__ import annotations

import itertools
import threading
from concurrent.futures import Future
from typing import Dict, Optional, Tuple

import numpy as np


class SearchServer:
    """Wraps an Index (or IndexEngine) with a concurrent search() API.

    search() is thread-safe and blocking; under concurrency, requests
    coalesce into batches of up to ``max_batch`` with at most ``timeout_us``
    of added latency — the num_threads-style scaling knob, TPU edition.
    """

    def __init__(self, index, topk: int = 10, ef: int = 100,
                 max_batch: int = 1024, timeout_us: int = 2000):
        dim = index.get_dim() if hasattr(index, "get_dim") else index.space.dim
        if dim is None:
            raise RuntimeError("index must be fitted before serving")
        self._index = index
        self.topk = topk
        self.ef = ef
        from .native import BatchQueue

        self._queue = BatchQueue(dim, capacity=8 * max_batch,
                                 max_batch=max_batch, timeout_us=timeout_us)
        self._futures: Dict[int, Future] = {}
        self._futures_lock = threading.Lock()
        self._ticket = itertools.count()
        self._closed = False
        self._dispatcher = threading.Thread(target=self._run, daemon=True)
        self._dispatcher.start()

    # ---- client side ----
    def search(self, query: np.ndarray, topk: Optional[int] = None,
               ef: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        """Blocking single-query search; safe from any thread.
        (Per-request topk/ef fall back to server defaults — requests in one
        batch share the server's topk/ef, like one Scheduler run. Asking
        for MORE than the server's width is an error, not a silent
        truncation to self.topk rows.)"""
        k = topk or self.topk
        if k > self.topk:
            raise ValueError(
                f"topk={k} exceeds this server's batch width "
                f"(topk={self.topk}); create the SearchServer with a "
                f"larger topk")
        fut = self.submit(query)
        ids, dists = fut.result()
        return ids[:k], dists[:k]

    def submit(self, query: np.ndarray) -> Future:
        if self._closed:
            raise RuntimeError("server closed")
        t = next(self._ticket)
        fut: Future = Future()
        with self._futures_lock:
            self._futures[t] = fut
        self._queue.push(t, np.asarray(query, dtype=np.float32))
        return fut

    # ---- dispatcher ----
    def _run(self) -> None:
        search = (self._index.batch_search_with_distance
                  if hasattr(self._index, "batch_search_with_distance")
                  else None)
        while True:
            batch, tickets = self._queue.pop_batch()
            if batch is None:
                break
            try:
                if hasattr(self._index, "_engine"):
                    ids, dists = self._index._engine.batch_search_with_distance(
                        batch, self.topk, ef=self.ef)
                else:
                    ids, dists = search(batch, self.topk, self.ef)
                err = None
            except Exception as e:  # propagate to all waiters in this batch
                ids = dists = None
                err = e
            with self._futures_lock:
                futs = [self._futures.pop(int(t), None) for t in tickets]
            for row, fut in enumerate(futs):
                if fut is None:
                    continue
                # a caller may have cancel()ed its future (it never enters
                # RUNNING, so cancel succeeds); set_* would then raise
                # InvalidStateError and kill this dispatcher thread,
                # hanging every later search
                try:
                    if err is not None:
                        fut.set_exception(err)
                    else:
                        fut.set_result((ids[row], dists[row]))
                except Exception:
                    pass
        # queue closed: fail every future still waiting so no client hangs
        with self._futures_lock:
            leftovers = list(self._futures.values())
            self._futures.clear()
        for fut in leftovers:
            try:
                if not fut.done():
                    fut.set_exception(RuntimeError("server closed"))
            except Exception:  # cancelled between done() and set_exception
                pass

    def close(self) -> None:
        self._closed = True
        self._queue.close()
        self._dispatcher.join(timeout=10)
