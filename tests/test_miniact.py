"""mini-ActivityNet generator + in-memory cache loader tests."""

import os

import numpy as np
import pytest

from adafocus_tpu.data.cache import CachedVideoLoader, maybe_cache
from adafocus_tpu.data.miniact import (
    MiniactConfig,
    class_motifs,
    generate,
    load_gt,
    oracle_actions,
    render_video,
)
from adafocus_tpu.data.pipeline import (
    FrameFolderSource,
    LoaderConfig,
    VideoLoader,
)
from adafocus_tpu.data.records import parse_list_file, return_dataset

TINY = MiniactConfig(
    num_classes=3, train_per_class=2, val_per_class=1, num_frames=4,
    canvas=64, tile=24, cell=8, num_distractors=1, marker_px=2,
    min_present=3, max_drift=12, jitter=1, seed=7,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("miniact"))
    generate(root, TINY, log=lambda *_: None)
    return root


def test_motifs_distinct_and_flip_invariant():
    m = class_motifs(TINY)
    assert m.shape == (3, 3, 3)
    assert np.array_equal(m, m[:, :, ::-1])  # horizontally symmetric
    assert len({p.tobytes() for p in m}) == 3


def test_render_video_structure():
    motifs = class_motifs(TINY)
    rng = np.random.default_rng(0)
    frames, centers, presence = render_video(1, motifs, rng, TINY)
    assert frames.shape == (4, 64, 64, 3)
    assert centers.shape == (4, 2) and presence.shape == (4,)
    assert presence.sum() >= TINY.min_present
    assert (centers > 0).all() and (centers < 1).all()
    # marker red must appear in present frames and not in absent ones
    for t in range(4):
        red = ((frames[t, :, :, 0] > 180) & (frames[t, :, :, 1] < 90)).sum()
        if presence[t]:
            assert red > 50
        else:
            assert red == 0


def test_generated_layout_parses(dataset):
    spec, frames_root, list_file = return_dataset("miniact", dataset, train=True)
    recs = parse_list_file(list_file, dataset="miniact")
    assert len(recs) == 6 and all(r.num_frames == 4 for r in recs)
    assert {r.primary_label for r in recs} == {0, 1, 2}
    first = os.path.join(frames_root, recs[0].path,
                         spec.image_tmpl.format(1))
    assert os.path.exists(first)
    paths, centers, presence = load_gt(dataset)
    assert len(paths) == 9  # 6 train + 3 val
    assert centers.shape == (9, 4, 2) and presence.shape == (9, 4)


def test_oracle_action_math():
    # canvas 256 -> center-crop 224; patch 96: action must recenter the
    # patch on the target up to floor quantization
    centers = np.array([[0.5, 0.5], [0.25, 0.75]], np.float32)
    presence = np.array([True, True])
    a = oracle_actions(centers, presence, canvas=256, input_size=224,
                       patch_size=96)
    got = np.floor(a * (224 - 96)) + 48  # patch centers in the 224 frame
    want = centers * 256 - 16
    assert np.abs(got - want).max() <= 1.0
    # absent frames -> frame center
    a2 = oracle_actions(centers, np.array([False, True]), 256, 224, 96)
    assert np.allclose(a2[0], 0.5)


def _loader(dataset, cache: str, mode_train: bool, **cfg_kw):
    spec, frames_root, list_file = return_dataset(
        "miniact", dataset, train=mode_train)
    recs = parse_list_file(list_file, dataset="miniact")
    cfg = LoaderConfig(
        num_segments=3, canvas_size=48, batch_size=2,
        mode="train" if mode_train else "val", num_workers=2,
        drop_last=mode_train, seed=11, **cfg_kw,
    )
    loader = VideoLoader(recs, FrameFolderSource(frames_root, spec.image_tmpl),
                         cfg)
    return maybe_cache(loader, cache)


@pytest.mark.parametrize("train", [True, False])
@pytest.mark.parametrize("dual", [False, True])
def test_cache_matches_streaming(dataset, train, dual):
    kw = {"num_segments_focuser": 4} if dual else {}
    plain = _loader(dataset, "", train, **kw)
    cached = _loader(dataset, "host", train, **kw)
    plain.set_epoch(3)
    cached.set_epoch(3)
    got_p, got_c = list(plain), list(cached)
    assert len(got_p) == len(got_c) == len(plain) == len(cached)
    for bp, bc in zip(got_p, got_c):
        assert set(bp) == set(bc)
        for k in bp:
            np.testing.assert_array_equal(bp[k], np.asarray(bc[k]))


def test_cache_device_mode(dataset):
    import jax.numpy as jnp

    cached = _loader(dataset, "device", True)
    batch = next(iter(cached))
    assert isinstance(batch["frames"], jnp.ndarray)
    assert batch["frames"].shape == (2, 3, 48, 48, 3)
    host = _loader(dataset, "host", True)
    np.testing.assert_array_equal(
        np.asarray(batch["frames"]), next(iter(host))["frames"])


def test_cache_rejects_nonuniform(dataset):
    spec, frames_root, list_file = return_dataset("miniact", dataset, True)
    recs = parse_list_file(list_file, dataset="miniact")
    import dataclasses

    recs[0] = dataclasses.replace(recs[0], num_frames=3)
    loader = VideoLoader(
        recs, FrameFolderSource(frames_root, spec.image_tmpl),
        LoaderConfig(num_segments=3, canvas_size=48, batch_size=2),
    )
    with pytest.raises(ValueError, match="uniform"):
        CachedVideoLoader(loader)
