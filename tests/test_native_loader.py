"""Native C++ image loader tests: build, decode correctness vs PIL, fallback."""

import numpy as np
import pytest
from PIL import Image

from vlm_tpu.data.native_loader import load_batch, native_available
from vlm_tpu.data.pipeline import prefetch_batches
from vlm_tpu.ops.preprocess import host_resize, recipe_for


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        img = Image.fromarray(
            rng.integers(0, 255, (240, 180, 3), dtype=np.uint8))
        p = d / f"img{i}.jpg"
        img.save(p, quality=92)
        paths.append(p)
    return paths


class TestNativeLoader:
    def test_builds(self):
        assert native_available(), "C++ imgloader should build in this image"

    @pytest.mark.parametrize("family", ["paligemma", "llava"])
    def test_matches_pil_closely(self, jpeg_dir, family):
        r = recipe_for(family)
        nat = load_batch(jpeg_dir, r, threads=2)
        pil = np.stack([host_resize(Image.open(p).convert("RGB"), r)
                        for p in jpeg_dir])
        assert nat.shape == pil.shape == (6, r.image_size, r.image_size, 3)
        diff = np.abs(nat.astype(int) - pil.astype(int))
        # Same resample family (antialiased bicubic); small numeric drift ok.
        assert diff.mean() < 1.0
        assert (diff > 20).mean() < 0.001

    def test_corrupt_jpeg_recovers(self, tmp_path, jpeg_dir):
        bad = tmp_path / "bad.jpg"
        bad.write_bytes(b"\xff\xd8\xff\xe0 this is not a jpeg")
        with pytest.raises(Exception):
            load_batch([jpeg_dir[0], bad], recipe_for("paligemma"))

    def test_force_pil_path(self, jpeg_dir):
        r = recipe_for("blip2")
        out = load_batch(jpeg_dir[:2], r, use_native=False)
        assert out.shape == (2, 224, 224, 3)


class TestPrefetch:
    def test_order_and_completeness(self):
        out = list(prefetch_batches(list(range(10)), lambda x: x * 2,
                                    depth=3))
        assert out == [x * 2 for x in range(10)]

    def test_exception_propagates(self):
        def boom(x):
            if x == 3:
                raise ValueError("boom")
            return x
        with pytest.raises(ValueError):
            list(prefetch_batches(range(5), boom))


class TestPNGNative:
    def test_png_decodes_natively(self, tmp_path):
        rng = np.random.default_rng(5)
        paths = []
        for i in range(3):
            img = Image.fromarray(
                rng.integers(0, 255, (90, 70, 3), dtype=np.uint8))
            p = tmp_path / f"x{i}.png"
            img.save(p)
            paths.append(p)
        # grayscale + palette variants must expand to RGB
        Image.fromarray(rng.integers(0, 255, (50, 50), dtype=np.uint8),
                        "L").save(tmp_path / "gray.png")
        Image.fromarray(rng.integers(0, 255, (50, 50, 3),
                                     dtype=np.uint8)).convert(
            "P").save(tmp_path / "pal.png")
        paths += [tmp_path / "gray.png", tmp_path / "pal.png"]
        r = recipe_for("llava")
        nat = load_batch(paths, r, threads=2)
        pil = np.stack([host_resize(Image.open(p).convert("RGB"), r)
                        for p in paths])
        diff = np.abs(nat.astype(int) - pil.astype(int))
        assert diff.mean() < 1.0

    def test_tall_image_center_crop_parity(self, tmp_path):
        """Extreme aspect ratio + crop mode exercises the row-restricted
        horizontal pass (only rows inside the crop's vertical support are
        resampled); output must still match PIL."""
        rng = np.random.default_rng(7)
        p = tmp_path / "tall.png"
        Image.fromarray(rng.integers(0, 255, (1200, 100, 3),
                                     dtype=np.uint8)).save(p)
        r = recipe_for("llava")          # shortest_edge_crop mode
        nat = load_batch([p], r, threads=1)
        pil = host_resize(Image.open(p).convert("RGB"), r)
        diff = np.abs(nat[0].astype(int) - pil.astype(int))
        assert diff.mean() < 1.0

    def test_interlaced_png(self, tmp_path):
        rng = np.random.default_rng(8)
        p = tmp_path / "adam7.png"
        Image.fromarray(rng.integers(0, 255, (80, 60, 3),
                                     dtype=np.uint8)).save(p, interlace=True)
        r = recipe_for("paligemma")
        nat = load_batch([p], r, threads=1)
        pil = host_resize(Image.open(p).convert("RGB"), r)
        diff = np.abs(nat[0].astype(int) - pil.astype(int))
        assert diff.mean() < 1.0

    def test_unsupported_format_in_batch(self, tmp_path, jpeg_dir):
        """A BMP in the batch must not disable native decode for the rest:
        the C++ side flags it and the PIL retry fills that slot."""
        p = tmp_path / "odd.bmp"
        Image.fromarray(np.random.default_rng(9).integers(
            0, 255, (64, 64, 3), dtype=np.uint8)).save(p)
        out = load_batch([jpeg_dir[0], p], recipe_for("blip2"))
        assert out.shape == (2, 224, 224, 3)
        assert out[1].std() > 0          # BMP slot filled via PIL

    def test_mixed_jpeg_png_batch(self, tmp_path, jpeg_dir):
        img = Image.fromarray(np.random.default_rng(6).integers(
            0, 255, (64, 64, 3), dtype=np.uint8))
        p = tmp_path / "m.png"
        img.save(p)
        out = load_batch([jpeg_dir[0], p], recipe_for("blip2"))
        assert out.shape == (2, 224, 224, 3)
        assert out[1].std() > 0       # not zero-filled
