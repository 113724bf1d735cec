"""Shared deterministic generation case for the multi-process dp×tp test:
the worker processes and the single-process reference must build the SAME
model, inputs and geometry, so the only variable is the execution topology.
"""

import jax
import jax.numpy as jnp
import numpy as np


def build_case():
    from vlm_tpu.models.configs import paligemma_config
    from vlm_tpu.models.vlm import init_vlm, num_image_tokens

    cfg = paligemma_config("test")
    module, params = init_vlm(cfg, jax.random.key(0), dtype=jnp.float32)
    s = cfg.vision.image_size
    batch = 4
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(batch, s, s, 3)).astype(np.float32)
    pre = np.ones((batch, 3), np.int32)
    post = np.ones((batch, 5), np.int32)
    plen = np.full((batch,), 3 + num_image_tokens(cfg) + 5, np.int32)
    return {
        "cfg": cfg, "module": module, "params": params,
        "pixels": pixels, "pre": pre, "post": post, "plen": plen,
        "max_new": 6, "n_stream": 6,
    }


def single_process_tokens():
    """Reference tokens on one device (wave + batcher)."""
    from vlm_tpu.generate.batcher import ContinuousBatcher
    from vlm_tpu.generate.decode import GenerationEngine

    case = build_case()
    engine = GenerationEngine(case["module"], case["cfg"],
                              batch_size=case["pixels"].shape[0],
                              max_prompt_len=int(case["plen"][0]),
                              max_new_tokens=case["max_new"],
                              cache_dtype=jnp.float32)
    res = engine.generate(case["params"], jnp.asarray(case["pixels"]),
                          case["pre"], case["post"], case["plen"])
    wave = np.asarray(res.tokens)

    batcher = ContinuousBatcher(case["module"], case["cfg"],
                                batch_size=case["pixels"].shape[0],
                                max_prompt_len=int(case["plen"][0]),
                                max_new_tokens=case["max_new"],
                                cache_dtype=jnp.float32)

    def pixel_fn(idxs):
        return jnp.asarray(
            case["pixels"][[i % case["pixels"].shape[0] for i in idxs]])

    token_lists = batcher.run(
        case["params"], pixel_fn,
        pre_ids_row=case["pre"][0], post_ids_row=case["post"][0],
        prompt_len_scalar=int(case["plen"][0]), n_images=case["n_stream"])
    return wave, token_lists
