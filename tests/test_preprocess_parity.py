"""Preprocessing parity: vlm_tpu host recipes vs the real HF image processors.

The reference preprocesses through ``AutoProcessor``
(`/root/reference/models/base_model.py:66`); our recipes
(`vlm_tpu/ops/preprocess.py`) promise bit-parity with the HF processors'
resize/crop/normalize. Here we instantiate the actual HF processor classes
(constructed from the public model-card parameters — no hub access) and
compare numerically on synthetic images of awkward sizes.
"""

from __future__ import annotations

import numpy as np
import pytest
from PIL import Image

pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from vlm_tpu.ops.preprocess import (CLIP_MEAN, CLIP_STD, host_batch,  # noqa: E402
                                    normalize_images, recipe_for)


def _images(seed=0):
    rng = np.random.default_rng(seed)
    sizes = [(48, 80), (333, 215), (224, 224), (400, 640)]
    return [Image.fromarray(
        rng.integers(0, 255, (h, w, 3), dtype=np.uint8)) for h, w in sizes]


def _ours(family, images):
    recipe = recipe_for(family)
    batch = host_batch(images, recipe)
    out = normalize_images(jnp.asarray(batch), recipe=recipe,
                           compute_dtype=jnp.float32)
    return np.asarray(out).transpose(0, 3, 1, 2)  # NHWC -> NCHW (HF layout)


def _assert_close(ours, theirs):
    assert ours.shape == theirs.shape, (ours.shape, theirs.shape)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_llava_clip_processor_parity():
    from transformers import CLIPImageProcessor
    proc = CLIPImageProcessor(
        do_resize=True, size={"shortest_edge": 336}, resample=3,
        do_center_crop=True, crop_size={"height": 336, "width": 336},
        do_rescale=True, do_normalize=True,
        image_mean=list(CLIP_MEAN), image_std=list(CLIP_STD),
        do_convert_rgb=True)
    imgs = _images(1)
    ref = proc(images=imgs, return_tensors="np").pixel_values
    _assert_close(_ours("llava", imgs), ref)


def test_paligemma_siglip_processor_parity():
    from transformers import SiglipImageProcessor
    proc = SiglipImageProcessor(
        do_resize=True, size={"height": 224, "width": 224}, resample=3,
        do_rescale=True, do_normalize=True,
        image_mean=[0.5, 0.5, 0.5], image_std=[0.5, 0.5, 0.5])
    imgs = _images(2)
    ref = proc(images=imgs, return_tensors="np").pixel_values
    _assert_close(_ours("paligemma", imgs), ref)


def test_blip2_processor_parity():
    from transformers import BlipImageProcessor
    proc = BlipImageProcessor(
        do_resize=True, size={"height": 224, "width": 224}, resample=3,
        do_rescale=True, do_normalize=True,
        image_mean=list(CLIP_MEAN), image_std=list(CLIP_STD),
        do_convert_rgb=True)
    imgs = _images(3)
    ref = proc(images=imgs, return_tensors="np").pixel_values
    _assert_close(_ours("blip2", imgs), ref)
