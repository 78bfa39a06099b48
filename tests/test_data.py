"""Data layer tests: record parsing, TSN sampling math, on-device
augmentation, loader pipeline (the reference has no tests at all for these
— SURVEY.md section 4)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from adafocus_tpu.data.records import (
    VideoRecord, parse_list_file, return_dataset, dataset_registry,
)
from adafocus_tpu.data.sampling import sample_dual_rate, sample_segment_indices
from adafocus_tpu.data.transforms import (
    AugmentConfig, augment_eval, augment_train, glance_downsample, normalize,
)
from adafocus_tpu.data.pipeline import (
    LoaderConfig, SyntheticVideoSource, VideoLoader,
)


# ---------------------------------------------------------------------------
# records
# ---------------------------------------------------------------------------


def test_parse_list_file_actnet(tmp_path):
    f = tmp_path / "list.txt"
    f.write_text(
        "vid_a,120,3\n"
        "vid_b,80,7,2,7\n"      # dup label collapses, sorted
        "vid_c,2,1\n"           # dropped: < 3 frames
    )
    recs = parse_list_file(str(f), dataset="actnet")
    assert len(recs) == 2
    assert recs[0] == VideoRecord("vid_a", 120, (3, -1, -1))
    assert recs[1].labels == (2, 7, -1)


def test_parse_list_file_whitespace():
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("12345 64 9\n")
        name = f.name
    try:
        recs = parse_list_file(name, dataset="somethingv1")
        assert recs[0].path == "12345" and recs[0].num_frames == 64
    finally:
        os.unlink(name)


def test_multilabel_shuffle_semantics():
    rec = VideoRecord("v", 10, (2, 7, -1))
    rng = np.random.default_rng(0)
    seen = {tuple(rec.sampled_labels(rng)) for _ in range(50)}
    assert seen == {(2, 7, -1), (7, 2, -1)}
    single = VideoRecord("v", 10, (4, -1, -1))
    assert tuple(single.sampled_labels(rng)) == (4, -1, -1)


def test_registry():
    reg = dataset_registry()
    assert reg["actnet"].num_classes == 200
    assert reg["fcvid"].num_classes == 239
    assert reg["somethingv1"].num_classes == 174
    spec, root, lst = return_dataset("actnet", "/data/actnet", train=False)
    assert root.endswith("frames") and lst.endswith("val_split.txt")


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def test_train_sampling_one_per_segment():
    rng = np.random.default_rng(0)
    idx = sample_segment_indices(160, 16, "train", rng)
    assert idx.shape == (16,)
    # each index falls in its segment [k*10+1, (k+1)*10]
    seg = (idx - 1) // 10
    assert np.array_equal(seg, np.arange(16))


def test_val_sampling_centers():
    idx = sample_segment_indices(160, 16, "val")
    assert np.array_equal(idx, 5 + 10 * np.arange(16) + 1)


def test_short_video_padding():
    idx = sample_segment_indices(5, 8, "val")
    assert idx.tolist() == [1, 2, 3, 4, 5, 5, 5, 5]
    rng = np.random.default_rng(0)
    idx = sample_segment_indices(5, 8, "train", rng)
    assert idx.tolist() == [1, 2, 3, 4, 5, 5, 5, 5]


def test_twice_sampling():
    idx = sample_segment_indices(100, 4, "test", twice=True)
    assert idx.shape == (8,)
    assert idx.tolist() == [13, 38, 63, 88, 1, 26, 51, 76]


def test_dense_sampling():
    rng = np.random.default_rng(0)
    idx = sample_segment_indices(200, 8, "train", rng, dense=True)
    assert idx.shape == (8,)
    assert np.all(np.diff(idx) == 8)  # stride 64//8
    test_idx = sample_segment_indices(200, 8, "test", dense=True)
    assert test_idx.shape == (80,)  # 10 clips
    assert np.all(test_idx >= 1) and np.all(test_idx <= 200)


def test_dual_rate():
    rng = np.random.default_rng(0)
    g, f = sample_dual_rate(120, 8, 12, "train", rng)
    assert g.shape == (8,) and f.shape == (12,)
    g2, f2 = sample_dual_rate(120, 8, 12, "val")
    assert np.all(np.diff(g2) > 0) and np.all(np.diff(f2) > 0)


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def test_normalize_values():
    cfg = AugmentConfig()
    x = jnp.full((1, 2, 4, 4, 3), 255, jnp.uint8)
    out = normalize(x, cfg)
    expect = (1.0 - np.array(cfg.mean)) / np.array(cfg.std)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0, 0]), expect, rtol=1e-5)


def test_augment_train_shapes_and_group_consistency():
    cfg = AugmentConfig(input_size=32)
    videos = np.zeros((2, 3, 64, 64, 3), np.uint8)
    # distinct constant per frame: group transform must preserve frame identity
    for t in range(3):
        videos[:, t] = (t + 1) * 40
    out = augment_train(jnp.asarray(videos), jax.random.key(0), cfg)
    assert out.shape == (2, 3, 32, 32, 3)
    # frames keep their own content (crop geometry shared, content per-frame)
    f0 = np.asarray(out[0, 0])
    f1 = np.asarray(out[0, 1])
    assert not np.allclose(f0, f1)


def test_augment_full_scale_is_identity_crop():
    """With scales=(1.0,) and flip off, augmentation = plain resize."""
    cfg = AugmentConfig(input_size=32, scales=(1.0,), flip=False)
    rng = np.random.default_rng(0)
    videos = rng.integers(0, 256, (1, 2, 32, 32, 3), np.uint8)
    out = augment_train(jnp.asarray(videos), jax.random.key(1), cfg)
    expect = normalize(jnp.asarray(videos, jnp.float32), cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-4)


def test_augment_eval_center_crop():
    cfg = AugmentConfig(input_size=2)
    videos = np.zeros((1, 1, 4, 4, 3), np.uint8)
    videos[0, 0, 1:3, 1:3] = 255
    out = augment_eval(jnp.asarray(videos), cfg)
    assert out.shape == (1, 1, 2, 2, 3)
    # the central 2x2 block is all-255 -> all pixels equal
    assert np.allclose(np.asarray(out), np.asarray(out)[0, 0, 0, 0])


def test_eval_crop_offsets_match_reference_math():
    """Anchor menus vs the reference's fill_fix_offset(False,...) corners+
    center (transforms.py:255-263) and GroupFullResSample's left/right/
    center (:153-159), quarter-stepped."""
    from adafocus_tpu.data.transforms import eval_crop_offsets

    h, w, s = 256, 320, 224
    hs, ws = (h - s) // 4, (w - s) // 4
    assert eval_crop_offsets(h, w, s, "oversample") == [
        (0, 0), (0, 4 * ws), (4 * hs, 0), (4 * hs, 4 * ws), (2 * hs, 2 * ws)]
    assert eval_crop_offsets(h, w, s, "full_res") == [
        (2 * hs, 0), (2 * hs, 4 * ws), (2 * hs, 2 * ws)]
    assert eval_crop_offsets(h, w, s, "center") == [((h - s) // 2,
                                                     (w - s) // 2)]
    with pytest.raises(ValueError):
        eval_crop_offsets(h, w, s, "diag")


def test_augment_eval_views_oversample():
    """10 views = 5 anchors x (crop, mirror); each view is exactly the
    normalized static slice of the canvas."""
    from adafocus_tpu.data.transforms import (
        augment_eval_views, eval_crop_offsets, num_eval_views,
    )

    cfg = AugmentConfig(input_size=8, eval_crops="oversample", flip=True)
    rng = np.random.default_rng(3)
    videos = rng.integers(0, 256, (2, 3, 16, 16, 3), np.uint8)
    assert num_eval_views(cfg) == 10
    out = np.asarray(augment_eval_views(jnp.asarray(videos), cfg))
    assert out.shape == (2, 10, 3, 8, 8, 3)
    ref = np.asarray(normalize(jnp.asarray(videos, jnp.float32), cfg))
    for i, (y0, x0) in enumerate(eval_crop_offsets(16, 16, 8, "oversample")):
        crop = ref[:, :, y0:y0 + 8, x0:x0 + 8, :]
        np.testing.assert_allclose(out[:, 2 * i], crop, atol=1e-6)
        np.testing.assert_allclose(out[:, 2 * i + 1], crop[:, :, :, ::-1, :],
                                   atol=1e-6)


def test_augment_eval_views_full_res_no_flip():
    from adafocus_tpu.data.transforms import augment_eval_views, num_eval_views

    cfg = AugmentConfig(input_size=4, eval_crops="full_res", flip=False)
    videos = np.zeros((1, 2, 8, 8, 3), np.uint8)
    assert num_eval_views(cfg) == 3
    out = augment_eval_views(jnp.asarray(videos), cfg)
    assert out.shape == (1, 3, 2, 4, 4, 3)


def test_batch_prep_oversample_views():
    """make_batch_prep folds the view fan into the clip-consensus k: the
    prepared batch carries B*V rows, labels repeated per view."""
    from adafocus_tpu.cli.common import make_batch_prep
    from adafocus_tpu.config import load_config

    cfg = load_config(None, [
        "model.num_classes=5", "model.num_frames=2", "model.image_size=16",
        "model.glance_size=8", "model.patch_size=8", "model.action_dim=4",
        "model.dtype=float32", "loader.canvas_size=24",
        "augment.eval_crops=oversample", "run.dataset=actnet",
    ])
    assert cfg.augment.eval_crops == "oversample"
    prep = make_batch_prep(cfg, train=False)
    raw = {
        "frames": np.zeros((2, 2, 24, 24, 3), np.uint8),
        "labels": np.asarray([1, 3]),
    }
    batch, labels, k = prep(raw, jax.random.key(0))
    assert k == 10
    assert batch["frames_small"].shape[0] == 20
    assert batch["frames_flat"].shape[:2] == (20, 2)
    np.testing.assert_array_equal(np.asarray(batch["labels"][:10]), 1)
    np.testing.assert_array_equal(np.asarray(batch["labels"][10:]), 3)
    np.testing.assert_array_equal(labels, [1, 3])


def test_glance_downsample():
    x = jnp.ones((2, 3, 16, 16, 3))
    out = glance_downsample(x, 8)
    assert out.shape == (2, 3, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------


def _records(n, frames=60):
    return [VideoRecord(f"v{i}", frames, (i % 5, -1, -1)) for i in range(n)]


def test_loader_shapes_single_rate():
    cfg = LoaderConfig(num_segments=4, canvas_size=32, batch_size=3,
                       num_workers=2, prefetch=1)
    loader = VideoLoader(_records(7), SyntheticVideoSource(), cfg)
    batches = list(loader)
    assert len(batches) == len(loader) == 2  # drop_last
    for b in batches:
        assert b["frames"].shape == (3, 4, 32, 32, 3)
        assert b["frames"].dtype == np.uint8
        assert b["labels"].shape == (3,)


def test_loader_dual_rate_and_multilabel():
    cfg = LoaderConfig(num_segments=4, num_segments_focuser=6, canvas_size=16,
                       batch_size=2, num_workers=2, multi_label=True)
    loader = VideoLoader(_records(4), SyntheticVideoSource(), cfg)
    b = next(iter(loader))
    assert b["frames"].shape == (2, 4, 16, 16, 3)
    assert b["frames_focuser"].shape == (2, 6, 16, 16, 3)
    assert b["labels"].shape == (2, 3)


def test_loader_host_sharding():
    recs = _records(8)
    cfg0 = LoaderConfig(num_segments=2, canvas_size=8, batch_size=2,
                        mode="val", host_id=0, num_hosts=2, num_workers=1)
    cfg1 = LoaderConfig(num_segments=2, canvas_size=8, batch_size=2,
                        mode="val", host_id=1, num_hosts=2, num_workers=1)
    l0 = VideoLoader(recs, SyntheticVideoSource(), cfg0)
    l1 = VideoLoader(recs, SyntheticVideoSource(), cfg1)
    labels0 = np.concatenate([b["labels"] for b in l0])
    labels1 = np.concatenate([b["labels"] for b in l1])
    assert len(labels0) == len(labels1) == 4
    # disjoint record sets
    assert set(r.path for r in l0.records).isdisjoint(
        r.path for r in l1.records
    )


def test_loader_epoch_reshuffle():
    recs = _records(6)
    cfg = LoaderConfig(num_segments=2, canvas_size=8, batch_size=2,
                       mode="train", num_workers=1)
    loader = VideoLoader(recs, SyntheticVideoSource(), cfg)
    loader.set_epoch(0)
    e0 = np.concatenate([b["labels"] for b in loader])
    loader.set_epoch(1)
    e1 = np.concatenate([b["labels"] for b in loader])
    assert sorted(e0.tolist()) == sorted(e1.tolist())
    assert e0.tolist() != e1.tolist()


def test_frame_folder_source_roundtrip(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from adafocus_tpu.data.pipeline import FrameFolderSource

    d = tmp_path / "vid1"
    d.mkdir()
    for i in (1, 2, 3):
        Image.fromarray(
            np.full((40, 60, 3), i * 50, np.uint8)
        ).save(d / f"image_{i:06d}.jpg")
    src = FrameFolderSource(str(tmp_path))
    rec = VideoRecord("vid1", 3, (0, -1, -1))
    assert src.exists(rec)
    frame = src.load_frame(rec, 2, canvas=32)
    assert frame.shape == (32, 32, 3)
    assert abs(int(frame.mean()) - 100) < 3
    # missing frame falls back to frame 1
    fallback = src.load_frame(rec, 99, canvas=32)
    assert abs(int(fallback.mean()) - 50) < 3


def test_loader_process_pool_matches_threads(tmp_path):
    """decode_procs>0 (the reference's worker-process DataLoader,
    main_dist.py:194-239) must produce bit-identical batches to the thread
    path: same sampling seeds, same decode."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from adafocus_tpu.data.pipeline import FrameFolderSource

    rng = np.random.RandomState(0)
    for v in range(4):
        d = tmp_path / f"vid{v}"
        d.mkdir()
        for i in (1, 2, 3, 4):
            Image.fromarray(
                rng.randint(0, 255, (40, 56, 3)).astype(np.uint8)
            ).save(d / f"image_{i:06d}.jpg")
    recs = [VideoRecord(f"vid{v}", 4, (v, -1, -1)) for v in range(4)]

    def run(decode_procs):
        src = FrameFolderSource(str(tmp_path))
        cfg = LoaderConfig(num_segments=2, canvas_size=24, batch_size=2,
                           mode="train", num_workers=2,
                           decode_procs=decode_procs)
        loader = VideoLoader(recs, src, cfg)
        loader.set_epoch(1)
        out = list(loader)
        loader.close()
        return out

    threads = run(0)
    procs = run(2)
    assert len(threads) == len(procs) == 2
    for bt, bp in zip(threads, procs):
        for k in bt:
            np.testing.assert_array_equal(bt[k], bp[k])


def test_loader_missing_video_resamples(tmp_path):
    from adafocus_tpu.data.pipeline import FrameFolderSource

    class FlakySource(SyntheticVideoSource):
        def exists(self, record):
            return record.path != "v0"

    cfg = LoaderConfig(num_segments=2, canvas_size=8, batch_size=2,
                       mode="val", num_workers=1)
    loader = VideoLoader(_records(4), FlakySource(), cfg)
    batches = list(loader)  # must not raise
    assert len(batches) == 2
