"""Host input pipeline: dataset -> prep -> batched prefetch.

The reference fans prep out to torch DataLoader worker *processes*
[ref: second/pytorch/builder/input_reader_builder.py — UNVERIFIED].  Two
producer modes here:

- thread pool (default): the numpy-heavy, GIL-releasing prep runs ahead
  of the device step on a few threads — enough for single-chip training.
- fork-inherited process pool (``process_workers=True`` /
  ``input_reader.process_workers``): the DataLoader-equivalent.  Workers
  inherit the prep closure by fork (the closures hold lambdas and are
  not picklable; only (idx, seed) tasks and example dicts cross the
  pipe), so host prep scales with cores — required to feed multi-chip
  DP training.

Both are batch-order deterministic: tasks are submitted in stream order,
collected in submission order, and per-sample rngs are seeded by
(epoch, index) so results do not depend on execution order.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import numpy as np

from ..data import batching

# fork-inherited state for process workers: the child resolves the prep
# dataset through this registry (its entry is added before the pool
# forks and fork inherits the whole dict), so nothing unpicklable ever
# crosses the process boundary — only (key, idx, seed) tasks and
# example dicts.  Keyed, not a single slot, so several process-backed
# loaders can coexist even with lazily-forked workers.
_FORK_REGISTRY: dict = {}


def _fork_worker_example(key: int, idx: int, seed: int) -> dict:
    return _FORK_REGISTRY[key].example(idx, seed)


class PrepDataset:
    """Dataset + prep closure; index-addressable examples."""

    def __init__(self, dataset, prep_fn: Callable[[dict, np.random.Generator],
                                                  dict]):
        self._dataset = dataset
        self._prep_fn = prep_fn

    def __len__(self):
        return len(self._dataset)

    def example(self, idx: int, seed: int) -> dict:
        rng = np.random.default_rng(seed)
        return self._prep_fn(self._dataset.get_sensor_data(idx), rng)

    @property
    def dataset(self):
        return self._dataset


class BatchLoader:
    """Infinite (train) or one-epoch (eval) batched iterator with
    background prefetch."""

    def __init__(self, prep_dataset: PrepDataset, batch_size: int,
                 shuffle: bool, num_workers: int = 2, seed: int = 0,
                 prefetch: int = 4, drop_last: bool = True,
                 repeat: bool = True, buckets=None, bucket_plans=None,
                 process_workers: bool = False):
        self._ds = prep_dataset
        self._batch_size = batch_size
        self._shuffle = shuffle
        self._workers = max(num_workers, 1)
        self._process_workers = bool(process_workers)
        self._seed = seed
        self._prefetch = prefetch
        self._drop_last = drop_last
        self._repeat = repeat
        # bucketed padding: sorted voxel-capacity buckets; each batch is
        # shrunk to the smallest bucket holding its densest member, so
        # sparse scans compile and run at a fraction of full capacity
        # without reordering the stream [ref: SURVEY.md §5.7]
        self._buckets = tuple(sorted(int(b) for b in buckets)) \
            if buckets else None
        # {bucket: block plan} for sparse-middle examples whose host
        # rulebooks were precomputed at their own bucket (preprocess) —
        # _emit pads them up to the batch bucket's plan shapes
        self._bucket_plans = bucket_plans

    def _emit(self, q, batch):
        """Merge one batch, applying bucketed shrinking when enabled.

        Host-rulebook examples (``rb*``) are padded from their own
        bucket's rulebook shapes up to the batch bucket's plan
        (``pad_rulebooks_to_plan``) when ``bucket_plans`` is set;
        without per-bucket plans they stay at full capacity."""
        has_rb = "rb0_subm_idx" in batch[0]
        if self._buckets and (not has_rb or self._bucket_plans):
            bucket = batching.pick_bucket(
                max(int(e["num_voxels"]) for e in batch), self._buckets)
            batch = [batching.shrink_to_bucket(e, bucket) for e in batch]
            if has_rb:
                plan = self._bucket_plans[bucket]
                batch = [batching.pad_rulebooks_to_plan(e, plan)
                         for e in batch]
        q.put(batching.merge_batch(batch))

    def _index_stream(self) -> Iterator[tuple]:
        rng = np.random.default_rng(self._seed)
        epoch = 0
        n = len(self._ds)
        while True:
            order = rng.permutation(n) if self._shuffle else np.arange(n)
            for i in order:
                yield int(i), int(epoch * 1_000_003 + i + self._seed)
            epoch += 1
            if not self._repeat:
                return

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self._prefetch)
        stop = threading.Event()

        def producer():
            try:
                batch = []
                for idx, seed in self._index_stream():
                    if stop.is_set():
                        return
                    batch.append(self._ds.example(idx, seed))
                    if len(batch) == self._batch_size:
                        self._emit(q, batch)
                        batch = []
                if batch and not self._drop_last:
                    self._emit(q, batch)
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        threads = [threading.Thread(target=producer, daemon=True)]
        if self._process_workers:
            threads = [threading.Thread(
                target=self._process_producer, args=(q, stop), daemon=True)]
        elif self._workers > 1:
            threads = [threading.Thread(
                target=self._pooled_producer, args=(q, stop), daemon=True)]
        for t in threads:
            t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()

    def _pooled_producer(self, q, stop):
        from concurrent.futures import ThreadPoolExecutor
        self._pool_producer(q, stop, ThreadPoolExecutor(self._workers),
                            self._ds.example)

    def _process_producer(self, q, stop):
        """Fork-inherited process pool (the lineage DataLoader model).

        Falls back to the thread pool when fork is unavailable (non-Linux
        spawn-only platforms: the prep closures are not picklable)."""
        import functools
        import multiprocessing as mp
        try:
            ctx = mp.get_context("fork")
        except ValueError:
            return self._pooled_producer(q, stop)
        from concurrent.futures import ProcessPoolExecutor
        key = id(self._ds)
        _FORK_REGISTRY[key] = self._ds   # inherited at fork time
        try:
            pool = ProcessPoolExecutor(self._workers, mp_context=ctx)
            self._pool_producer(
                q, stop, pool,
                functools.partial(_fork_worker_example, key))
        finally:
            _FORK_REGISTRY.pop(key, None)

    def _pool_producer(self, q, stop, pool, submit_fn):
        try:
            with pool:
                pending = []
                stream = self._index_stream()
                exhausted = False
                while not stop.is_set():
                    while len(pending) < self._batch_size * 2 and not exhausted:
                        try:
                            idx, seed = next(stream)
                        except StopIteration:
                            exhausted = True
                            break
                        pending.append(pool.submit(submit_fn, idx, seed))
                    if len(pending) >= self._batch_size:
                        batch = [f.result() for f in
                                 pending[: self._batch_size]]
                        pending = pending[self._batch_size :]
                        self._emit(q, batch)
                    elif exhausted:
                        if pending and not self._drop_last:
                            self._emit(
                                q, [f.result() for f in pending])
                        break
        except Exception as e:
            q.put(e)
        finally:
            q.put(None)
