"""Native frame-loader tests: decode parity vs the PIL path, batch decode
with failure statuses, and integration through FrameFolderSource."""

import os

import numpy as np
import pytest

from adafocus_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native frame loader not built"
)


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("jpegs")
    # smooth gradients: resampling kernels (antialiased PIL vs pure
    # bilinear native) agree on smooth content, so diffs expose geometry
    # bugs rather than kernel choice. landscape, portrait, square, tiny.
    shapes = [(48, 64), (64, 48), (56, 56), (20, 28)]
    paths = []
    for i, (h, w) in enumerate(shapes):
        yy, xx = np.mgrid[0:h, 0:w]
        arr = np.stack([
            (255 * xx / max(w - 1, 1)),
            (255 * yy / max(h - 1, 1)),
            (255 * (xx + yy) / max(w + h - 2, 1)),
        ], axis=-1).astype(np.uint8)
        p = str(d / f"img{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    solid = np.full((40, 60, 3), (200, 30, 90), np.uint8)
    p = str(d / "solid.jpg")
    Image.fromarray(solid).save(p, quality=95)
    return {"paths": paths, "solid": p, "dir": str(d)}


def test_decode_solid_color(jpeg_dir):
    out = native.decode_file(jpeg_dir["solid"], canvas=32)
    assert out is not None and out.shape == (32, 32, 3)
    mean = out.reshape(-1, 3).mean(axis=0)
    np.testing.assert_allclose(mean, [200, 30, 90], atol=6)


def test_decode_matches_pil_geometry(jpeg_dir):
    """Native decode+resize+crop must match the PIL reference path closely
    (same geometry; small pixel diffs from resampling kernels are fine)."""
    from PIL import Image

    for p in jpeg_dir["paths"][:3]:
        canvas = 32
        got = native.decode_file(p, canvas)
        assert got is not None
        img = Image.open(p).convert("RGB")
        w, h = img.size
        scale = canvas / min(w, h)
        img = img.resize(
            (max(canvas, round(w * scale)), max(canvas, round(h * scale))),
            Image.BILINEAR,
        )
        w, h = img.size
        x0, y0 = (w - canvas) // 2, (h - canvas) // 2
        ref = np.asarray(img.crop((x0, y0, x0 + canvas, y0 + canvas)))
        diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
        assert diff.mean() < 6.0, f"mean abs diff {diff.mean():.2f} for {p}"


def test_decode_batch_with_failures(jpeg_dir):
    paths = jpeg_dir["paths"] + [os.path.join(jpeg_dir["dir"], "missing.jpg")]
    frames, status = native.decode_batch(paths, canvas=32, n_threads=4)
    assert frames is not None and frames.shape == (5, 32, 32, 3)
    assert status[:4].sum() == 0 and status[4] != 0
    single = native.decode_file(paths[0], 32)
    np.testing.assert_array_equal(frames[0], single)


def test_frame_folder_source_native(tmp_path):
    from PIL import Image

    from adafocus_tpu.data.pipeline import FrameFolderSource
    from adafocus_tpu.data.records import VideoRecord

    d = tmp_path / "vidn"
    d.mkdir()
    for i in (1, 2):
        Image.fromarray(
            np.full((40, 60, 3), i * 60, np.uint8)
        ).save(d / f"image_{i:06d}.jpg")
    src = FrameFolderSource(str(tmp_path))
    assert src._native is not None
    rec = VideoRecord("vidn", 2, (0, -1, -1))
    frame = src.load_frame(rec, 2, canvas=32)
    assert frame.shape == (32, 32, 3)
    assert abs(int(frame.mean()) - 120) < 4
    # missing index falls back to frame 1
    fb = src.load_frame(rec, 7, canvas=32)
    assert abs(int(fb.mean()) - 60) < 4


def test_frame_folder_source_batch_load(tmp_path):
    from PIL import Image

    from adafocus_tpu.data.pipeline import FrameFolderSource
    from adafocus_tpu.data.records import VideoRecord

    d = tmp_path / "vidb"
    d.mkdir()
    for i in (1, 2, 3):
        Image.fromarray(
            np.full((40, 60, 3), i * 40, np.uint8)
        ).save(d / f"image_{i:06d}.jpg")
    src = FrameFolderSource(str(tmp_path))
    rec = VideoRecord("vidb", 3, (0, -1, -1))
    frames = src.load_frames(rec, [1, 3, 9], canvas=32)  # 9 = missing
    assert frames.shape == (3, 32, 32, 3)
    assert abs(int(frames[0].mean()) - 40) < 4
    assert abs(int(frames[1].mean()) - 120) < 4
    assert abs(int(frames[2].mean()) - 40) < 4  # fell back to frame 1
