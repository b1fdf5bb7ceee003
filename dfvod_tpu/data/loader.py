"""Host loader — batching, static-shape collation, double-buffered device
transfer.

Replaces the reference's DataLoader + CUDA-stream prefetchers
(``datasets/data_prefetcher_single.py``, ``data_prefetcher_multi.py``) and
its NestedTensor collate (``util/misc.py:304-381``): a thread prefetches and
collates the next batch while the device computes, then ``device_put``s it
(sharded over the mesh's data axis when one is given) so the H2D copy
overlaps compute — the TPU equivalent of the side-stream copy.

Clip semantics match ``util/misc_multi.py:304-340``: a clip of (1 + N)
frames is split into per-frame images so the batch dim is
``B * (1 + num_ref_frames)`` frames, key frames first within each clip
group (frame order [key, ref1, ..., refN] preserved).

Multi-host sharding follows the reference's ``DistributedSampler``
contiguous-shard split (``datasets/samplers.py:48-66``): each process takes
``rank * num_samples`` onward, after padding to a multiple of world size.
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, List

import numpy as np

from dfvod_tpu.data.transforms import bucket_shape, normalize_and_pad, pad_u8


def shard_indices(n: int, rank: int, world: int, *, shuffle: bool,
                  seed: int, epoch: int) -> np.ndarray:
    """Pad-to-even then contiguous shard (``samplers.py:48-66``)."""
    if shuffle:
        g = np.random.default_rng(seed + epoch)
        order = g.permutation(n)
    else:
        order = np.arange(n)
    num = -(-n // world)  # ceil
    order = np.concatenate([order, order[: num * world - n]])
    return order[rank * num:(rank + 1) * num]


class Loader:
    """Iterable over device-ready batches.

    batch dict: image (B', H, W, C), mask (B', H, W), labels (B', T),
    boxes (B', T, 4), valid (B', T), image_id (B',), size/orig_size (B', 2)
    where B' = batch_size * clip_len frames.
    """

    def __init__(self, dataset, transform, *, batch_size: int,
                 max_boxes: int = 64, use_depth: bool = False,
                 shuffle: bool = True, seed: int = 42,
                 rank: int = 0, world: int = 1,
                 mesh=None, clip_parallel: bool = False,
                 drop_last: bool = False, prefetch: int = 2,
                 bucket_step: int = 128, pad_cap: int = 1344,
                 device_preprocess: bool = False, pack_s2d: bool = False,
                 num_workers: int = 0):
        self.dataset = dataset
        self.transform = transform
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        self.use_depth = use_depth
        self.shuffle = shuffle
        self.seed = seed
        self.rank, self.world = rank, world
        self.mesh = mesh
        self.clip_parallel = clip_parallel
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.bucket_step = bucket_step
        self.pad_cap = pad_cap
        # ship uint8 + sizes; normalization/mask happen inside the jitted
        # step (``data/device_pipeline.py``) — 4x less H2D traffic
        self.device_preprocess = device_preprocess
        # host-side 2x2 space-to-depth packing of the uint8 batch
        # (``device_pipeline.pack_s2d``): same bytes, strided on host,
        # saves ~2.6 ms of on-device relayout per B=8 step (PERF.md)
        if pack_s2d and not device_preprocess:
            raise ValueError("pack_s2d requires device_preprocess=True "
                             "(packing operates on the uint8 batch)")
        self.pack_s2d = pack_s2d
        # ``--num_workers`` parity (reference ``main.py:156``, DataLoader
        # worker processes): >0 fans batch fetch+decode+augment out to a
        # thread pool (PIL/cv2 release the GIL during decode). Batches
        # stay in order and augmentation draws are deterministic per
        # (seed, epoch, rank, batch index) regardless of worker count.
        self.num_workers = num_workers
        # DFVOD_BUCKET_LADDER="512,896": snap every padded dim UP to the
        # nearest ladder rung instead of the 128-multiple bucket. The
        # axon tunnel charges ~2-3.5 min per DISTINCT program (compile
        # and cached-executable load cost the same through the remote
        # PJRT client — measured round 5, logs_r5/oid_joint_s42.log: 14
        # train-bucket programs, ~50 min of a 25-epoch run), so the
        # strong-aug runs trade ~25% padded compute for an ~11x cut in
        # program count. Padding is masked everywhere (attention masks,
        # loss, evaluator use true sizes), so semantics are unchanged.
        ladder = os.environ.get("DFVOD_BUCKET_LADDER", "")
        self.bucket_ladder = (tuple(sorted(int(v) for v in
                                           ladder.split(",")))
                              if ladder else None)
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        per_rank = -(-len(self.dataset) // self.world)
        if self.drop_last:
            return per_rank // self.batch_size
        return -(-per_rank // self.batch_size)

    def _collate(self, clips: List[List], rng) -> dict:
        frames = []
        for clip in clips:
            frames.extend(self.transform(clip, rng))
        # one static bucket per batch: the max over frames, bucketed
        hs = [f.rgb.shape[0] for f in frames]
        ws = [f.rgb.shape[1] for f in frames]
        if self.bucket_ladder:
            snap = lambda v: next((s for s in self.bucket_ladder  # noqa
                                   if v <= s), self.pad_cap)
            ph, pw = snap(max(hs)), snap(max(ws))
        else:
            ph, pw = bucket_shape(max(hs), max(ws), self.bucket_step,
                                  self.pad_cap)
        if self.device_preprocess:
            # write frames straight into the batch canvas (no per-frame
            # allocation, no np.stack copy — single-core host)
            C = 4 if self.use_depth else 3
            canvas = np.zeros((len(frames), ph, pw, C), np.uint8)
            cols = [pad_u8(f, (ph, pw), self.use_depth, self.max_boxes,
                           out_img=canvas[i])
                    for i, f in enumerate(frames)]
            batch = {k: np.stack([c[k] for c in cols])
                     for k in cols[0] if k != "image"}
            batch["image"] = canvas
        else:
            cols = [normalize_and_pad(f, (ph, pw), self.use_depth,
                                      self.max_boxes) for f in frames]
            batch = {k: np.stack([c[k] for c in cols]) for k in cols[0]}
        if self.pack_s2d:
            from dfvod_tpu.data.device_pipeline import pack_s2d
            batch["image"] = pack_s2d(batch["image"])
        return batch

    def _device_put(self, batch: dict) -> dict:
        if self.mesh is None:
            return batch
        n_dev = self.mesh.devices.size
        rows = len(batch["image"])
        if rows % n_dev != 0:
            raise ValueError(
                f"batch of {rows} frame rows (batch_size x clip frames) "
                f"is not divisible by the {n_dev}-device mesh; pick a "
                f"batch_size so that batch_size * (1 + num_ref_frames) "
                f"% devices == 0")
        from dfvod_tpu.parallel import shard_batch
        return shard_batch(batch, self.mesh, self.clip_parallel)

    def _batch_chunks(self) -> Iterator[np.ndarray]:
        idx = shard_indices(len(self.dataset), self.rank, self.world,
                            shuffle=self.shuffle, seed=self.seed,
                            epoch=self.epoch)
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i:i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            # pad the final short batch by wrapping (keeps static shapes)
            if len(chunk) < self.batch_size:
                chunk = np.concatenate(
                    [chunk, idx[: self.batch_size - len(chunk)]])
            yield chunk

    def _make_batch(self, batch_index: int, chunk: np.ndarray) -> dict:
        rng = np.random.default_rng(
            (self.seed, self.epoch, self.rank, batch_index))
        return self._collate([self.dataset[int(j)] for j in chunk], rng)

    def _host_batches(self) -> Iterator[dict]:
        for bi, chunk in enumerate(self._batch_chunks()):
            yield self._make_batch(bi, chunk)

    def first_batch(self) -> dict:
        """One batch, synchronously — for shape/state initialization.
        (``next(iter(loader))`` would leave a prefetch worker blocked on a
        full queue holding batches in host RAM.)"""
        return self._device_put(next(self._host_batches()))

    def _pool_batches(self) -> Iterator[dict]:
        """num_workers > 0: fetch/decode/augment whole batches in a
        thread pool, a bounded window ahead, yielding in order."""
        from concurrent.futures import ThreadPoolExecutor
        from collections import deque
        window = self.num_workers + self.prefetch
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending: deque = deque()
            for bi, chunk in enumerate(self._batch_chunks()):
                pending.append(pool.submit(self._make_batch, bi, chunk))
                if len(pending) >= window:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()

    def __iter__(self) -> Iterator[dict]:
        if self.num_workers > 0:
            for b in self._pool_batches():
                yield self._device_put(b)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for b in self._host_batches():
                    q.put(b)
                q.put(stop)
            except BaseException as e:  # propagate into the consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is stop:
                return
            if isinstance(b, BaseException):
                raise b
            yield self._device_put(b)
