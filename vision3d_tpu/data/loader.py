"""Host batching into fixed-capacity device arrays + threaded prefetch.

Replaces the reference's torch DataLoader + collate + Preprocessor stack
(vision3d/core/preprocess.py:64-79, train.py:13-20). The reference pads
each batch's point clouds to the max length by resampling
(preprocess.py:35-45) and voxelizes on the host CPU; here padding goes to
a *fixed* capacity (static shapes for jit) and voxelization happens on
device inside the model graph, so the host only ships one (B, P, C) array
per batch. A background thread pipelines CPU work (disk + augmentation)
with TPU steps — the TPU-native counterpart of the reference's 6 worker
processes.
"""

import multiprocessing
import queue
import threading
from concurrent.futures import ProcessPoolExecutor

import numpy as np

from vision3d_tpu.config import Config

# Worker-process globals (set once per worker by _init_worker; fork
# inheritance makes the initializer a no-op copy, spawn re-pickles).
_WORKER_DATASET = None
_WORKER_CFG = None


def _init_worker(dataset, cfg):
    global _WORKER_DATASET, _WORKER_CFG
    # keep any accidental jax use in workers off the TPU: backends init
    # lazily, so setting this before first use is sufficient
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    _WORKER_DATASET = dataset
    _WORKER_CFG = cfg


def _worker_batch(indices, seed):
    """Materialize + collate one batch in a worker process.

    Each batch gets its own seeded rng (reproducible regardless of which
    worker runs it); the dataset's rng is swapped process-locally so
    augmentation draws from it.
    """
    rng = np.random.default_rng(seed)
    ds = _WORKER_DATASET
    if hasattr(ds, "rng"):
        ds.rng = rng
    items = [ds[int(j)] for j in indices]
    return collate(items, _WORKER_CFG, rng)


def pad_points(points: np.ndarray, capacity: int, rng) -> tuple:
    """Pad by resampling (reference preprocess.py:35-45) or subsample down
    to ``capacity`` (fixed-shape divergence: the reference never truncates;
    default capacity 32768 exceeds any FOV-cropped KITTI cloud)."""
    n = len(points)
    if n == 0:
        return np.zeros((capacity, points.shape[1]), points.dtype), 0
    if n >= capacity:
        idx = rng.choice(n, capacity, replace=False)
        return points[idx], capacity
    pad_idx = rng.integers(0, n, capacity - n)
    return np.concatenate([points, points[pad_idx]]), n


def collate(items, cfg: Config, rng) -> dict:
    """List of sample dicts -> fixed-capacity numpy batch."""
    P = cfg.capacity.max_points
    G = cfg.capacity.max_gt_boxes
    B = len(items)
    c_in = items[0]["points"].shape[1]

    points = np.zeros((B, P, c_in), np.float32)
    num_points = np.zeros((B,), np.int32)
    boxes = np.zeros((B, G, 7), np.float32)
    class_idx = np.zeros((B, G), np.int32)
    gt_mask = np.zeros((B, G), bool)
    box_ignore = np.zeros((B, G), bool)
    idx = np.zeros((B,), np.int64)

    for b, item in enumerate(items):
        points[b], num_points[b] = pad_points(
            item["points"].astype(np.float32), P, rng
        )
        n = min(len(item["boxes"]), G)
        boxes[b, :n] = item["boxes"][:n]
        class_idx[b, :n] = item["class_idx"][:n]
        gt_mask[b, :n] = True
        if "box_ignore" in item:
            box_ignore[b, :n] = item["box_ignore"][:n]
        idx[b] = item.get("idx", -1)

    return dict(
        points=points,
        num_points=num_points,
        boxes=boxes,
        class_idx=class_idx,
        gt_mask=gt_mask,
        box_ignore=box_ignore,
        frame_idx=idx,
    )


class DataLoader:
    """Epoch iterator with background prefetch.

    ``num_workers=0`` (default) prefetches on one thread; ``num_workers>0``
    fans each batch's disk+augmentation+collate out to a pool of worker
    PROCESSES (the TPU counterpart of the reference's 6 DataLoader
    workers, vision3d/train.py:18 — augmentation is GIL-bound numpy at
    ~50-100 ms/frame, so threads cannot feed a fast train step)."""

    def __init__(self, dataset, cfg: Config, batch_size=None, shuffle=True,
                 drop_last=True, seed=0, prefetch=2, num_workers=0,
                 num_shards=1, shard_id=0):
        self.dataset = dataset
        self.cfg = cfg
        self.batch_size = batch_size or cfg.train.batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.num_workers = num_workers
        # multi-host input sharding: every process builds the SAME shuffled
        # epoch order (same seed) and keeps a disjoint stride-slice of it;
        # batch_size here is the PER-PROCESS batch (global / num_shards)
        self.num_shards = num_shards
        self.shard_id = shard_id

    def _order(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        if self.num_shards > 1:
            order = order[self.shard_id::self.num_shards]
        return order

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        order = self._order()
        nb = len(self)
        for i in range(nb):
            sel = order[i * self.batch_size : (i + 1) * self.batch_size]
            items = [self.dataset[int(j)] for j in sel]
            yield collate(items, self.cfg, self.rng)

    def _executor(self):
        # one persistent pool across epochs: spawn startup (interpreter +
        # dataset pickle per worker) costs ~10-15s and would otherwise be
        # paid at every epoch boundary
        if getattr(self, "_pool", None) is None:
            # spawn, as the reference does (train.py:99): forking a
            # process that already initialized a TPU backend can deadlock
            ctx = multiprocessing.get_context("spawn")
            self._pool = ProcessPoolExecutor(
                max_workers=self.num_workers, mp_context=ctx,
                initializer=_init_worker, initargs=(self.dataset, self.cfg),
            )
        return self._pool

    def _iter_mp(self):
        order = self._order()
        nb = len(self)
        jobs = [
            # shard_id decorrelates augmentation draws across hosts (every
            # host's rng emits the same stream to keep shuffles in sync)
            (order[i * self.batch_size : (i + 1) * self.batch_size],
             int(self.rng.integers(0, 2**31)) ^ (self.shard_id * 0x5BD1E995
                                                 & 0x7FFFFFFF))
            for i in range(nb)
        ]
        ex = self._executor()
        inflight = max(self.num_workers + self.prefetch, 2)
        futures = [
            ex.submit(_worker_batch, idx, seed)
            for idx, seed in jobs[:inflight]
        ]
        nxt = inflight
        for i in range(nb):
            batch = futures[i].result()
            if nxt < nb:
                futures.append(ex.submit(_worker_batch, *jobs[nxt]))
                nxt += 1
            yield batch

    def close(self):
        if getattr(self, "_pool", None) is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __iter__(self):
        if self.num_workers > 0:
            yield from self._iter_mp()
            return
        q = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for batch in self._batches():
                    q.put(batch)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is stop:
                break
            yield batch
