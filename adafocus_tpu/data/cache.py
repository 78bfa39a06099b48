"""In-memory dataset caching: decode once, train from RAM or HBM.

On hosts where JPEG decode is the bottleneck (the reference hides this
behind many DataLoader worker processes, /root/reference
actnet/main_dist.py:194-239; this container has ONE core and a tunneled
TPU, making training ~99% host-bound), small datasets can be decoded once
through the real source path and then served from memory:

* ``host`` mode keeps one (N, T, S, S, 3) uint8 array in host RAM —
  removes decode from the steady state, keeps the per-batch H2D copy.
* ``device`` mode puts that array in HBM; per-batch assembly is a jitted
  gather, so steady-state epochs involve NO host work and NO host->device
  traffic at all — the TPU-native answer to input-bound training (the
  tf.data ``.cache()`` idea, applied at the frame level).

Sampling, shuffling, labels, and batch order replicate ``VideoLoader``
exactly (same seed derivations), so cached and streamed runs are
bit-identical — tested in tests/test_cache.py. TSN segment sampling stays
dynamic: the cache holds ALL stored frames; per-epoch segment draws become
index gathers.

Requires every record to have the same stored frame count (true for the
generated benchmarks this is for); variable-length datasets should stream.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from adafocus_tpu.data.pipeline import VideoLoader
from adafocus_tpu.data.sampling import sample_dual_rate, sample_segment_indices


class CachedVideoLoader:
    """Drop-in iterable wrapper over a ``VideoLoader`` (same batch dicts);
    ``device=True`` yields frames as device arrays."""

    def __init__(self, inner: VideoLoader, device: bool = False):
        self.inner = inner
        self.cfg = inner.cfg
        self.records = inner.records
        self.device = device
        self._frames: Optional[object] = None  # (N, T, S, S, 3) uint8
        if not self.records:
            raise ValueError("cache: empty record list")
        counts = {r.num_frames for r in self.records}
        if len(counts) != 1:
            raise ValueError(
                "cache requires a uniform stored frame count per video; got "
                f"{sorted(counts)[:5]}... — use the streaming loader for "
                "variable-length datasets"
            )
        self._t_stored = self.records[0].num_frames

    # -- construction --------------------------------------------------------

    def _ensure_cache(self) -> None:
        if self._frames is not None:
            return
        cfg = self.cfg
        frames = self._load_memoized()
        if frames is None:
            src = self.inner.source
            all_idx = np.arange(1, self._t_stored + 1)
            first = self._load_all(
                src, self.records[0], all_idx, cfg.canvas_size)
            frames = np.empty(
                (len(self.records),) + first.shape, np.uint8)
            frames[0] = first
            for i, rec in enumerate(self.records[1:], start=1):
                frames[i] = self._load_all(src, rec, all_idx, cfg.canvas_size)
            self._save_memoized(frames)
        if self.device:
            import jax

            self._frames = jax.device_put(frames)
        else:
            self._frames = frames

    # -- decoded-cache disk memoization --------------------------------------
    #
    # Recipe harnesses run each training stage as its own process; without
    # memoization every process re-decodes the full dataset (minutes on a
    # 1-core host). The decoded (N, T, S, S, 3) uint8 array round-trips
    # through one .npy beside the dataset, keyed by record count / frame
    # count / canvas so layout changes invalidate it.

    def _memo_path(self) -> str:
        import os

        cfg = self.cfg
        root = getattr(self.inner.source, "root", "")
        name = (f".decoded_{cfg.mode}_{len(self.records)}x{self._t_stored}"
                f"_c{cfg.canvas_size}.npy")
        return os.path.join(root, name) if root and os.path.isdir(root) else ""

    def _load_memoized(self):
        import os

        path = self._memo_path()
        if not path or not os.path.exists(path):
            return None
        try:
            arr = np.load(path, mmap_mode=None)
        except Exception:
            return None
        want = (len(self.records), self._t_stored)
        if arr.shape[:2] != want or arr.dtype != np.uint8:
            return None
        return arr

    def _save_memoized(self, frames: np.ndarray) -> None:
        import os

        path = self._memo_path()
        if not path:
            return
        try:
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                np.save(f, frames)
            os.replace(tmp, path)
        except OSError:
            pass  # read-only dataset dir / no space: stay un-memoized

    @staticmethod
    def _load_all(src, record, indices, canvas) -> np.ndarray:
        if hasattr(src, "load_frames"):
            return src.load_frames(record, indices, canvas)
        return np.stack(
            [src.load_frame(record, int(i), canvas) for i in indices]
        )

    # -- VideoLoader protocol ------------------------------------------------

    def __len__(self) -> int:
        return len(self.inner)

    def set_epoch(self, epoch: int) -> None:
        self.inner.set_epoch(epoch)

    def close(self) -> None:
        self.inner.close()
        self._frames = None

    def _gather(self, vid_idx: np.ndarray, frame_idx: np.ndarray):
        """(B,) video rows + (B, T) 0-based frame indices -> (B, T, S, S, 3)."""
        if self.device:
            import jax
            import jax.numpy as jnp

            if not hasattr(self, "_gather_jit"):
                def g(cache, vids, frames):
                    rows = cache[vids]
                    return jnp.take_along_axis(
                        rows, frames[:, :, None, None, None], axis=1
                    )

                self._gather_jit = jax.jit(g)
            return self._gather_jit(
                self._frames, jnp.asarray(vid_idx), jnp.asarray(frame_idx)
            )
        return self._frames[vid_idx[:, None], frame_idx]

    def __iter__(self) -> Iterator[dict]:
        self._ensure_cache()
        cfg = self.cfg
        inner = self.inner
        batches = inner._batch_order()
        base_seed = hash((cfg.seed, inner._epoch, cfg.host_id)) & 0x7FFFFFFF
        mode = cfg.mode
        for bi, batch_indices in enumerate(batches):
            idx_g, idx_f, labels = [], [], []
            for k, j in enumerate(batch_indices):
                rec = self.records[j]
                rng = np.random.default_rng(
                    base_seed + bi * cfg.batch_size + k)
                if cfg.num_segments_focuser:
                    g, f = sample_dual_rate(
                        rec.num_frames, cfg.num_segments,
                        cfg.num_segments_focuser, mode, rng,
                        cfg.dense_sample, cfg.twice_sample,
                    )
                    idx_f.append(f - 1)
                else:
                    g = sample_segment_indices(
                        rec.num_frames, cfg.num_segments, mode, rng,
                        cfg.dense_sample, cfg.twice_sample,
                    )
                idx_g.append(g - 1)
                if cfg.multi_label:
                    labels.append(rec.sampled_labels(rng) if mode == "train"
                                  else np.asarray(rec.labels, np.int64))
                else:
                    labels.append(rec.primary_label)
            vid = np.asarray(batch_indices, np.int32)
            out = {
                "frames": self._gather(vid, np.asarray(idx_g, np.int32)),
                "labels": np.asarray(labels, np.int32),
                "record_index": vid,
            }
            if idx_f:
                out["frames_focuser"] = self._gather(
                    vid, np.asarray(idx_f, np.int32))
            yield out


def maybe_cache(loader: VideoLoader, mode: str):
    """'' -> unchanged; 'host'/'device' -> cached wrapper."""
    if not mode:
        return loader
    if mode not in ("host", "device"):
        raise ValueError(f"loader.cache must be '', 'host', or 'device'; "
                         f"got {mode!r}")
    return CachedVideoLoader(loader, device=(mode == "device"))
