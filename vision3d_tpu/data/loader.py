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

import queue
import threading

import numpy as np

from vision3d_tpu.config import Config


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
    """Minimal epoch iterator with background prefetch."""

    def __init__(self, dataset, cfg: Config, batch_size=None, shuffle=True,
                 drop_last=True, seed=0, prefetch=2):
        self.dataset = dataset
        self.cfg = cfg
        self.batch_size = batch_size or cfg.train.batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        nb = len(self)
        for i in range(nb):
            sel = order[i * self.batch_size : (i + 1) * self.batch_size]
            items = [self.dataset[int(j)] for j in sel]
            yield collate(items, self.cfg, self.rng)

    def __iter__(self):
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
