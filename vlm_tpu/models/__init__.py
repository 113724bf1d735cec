"""Models layer: ViT towers, decoders, projectors, assembled VLMs, factory,
vision backbone, weight conversion (SURVEY.md §2 items 1-9)."""

from .backbone import VisionBackbone
from .base_model import (BLIP2OptModel, LLaVAModel, PaLIGemmaModel, VLMModel)
from .configs import (VLM_CONFIGS, DecoderConfig, QFormerConfig, ViTConfig,
                      VLMConfig, blip2_config, llava_config,
                      paligemma_config)
from .decoder import Decoder, init_decoder, init_kv_cache
from .factory import VLMModelFactory
from .vit import ViTEncoder, init_vit
from .vlm import VLMModule, init_vlm, num_image_tokens

__all__ = [
    "VisionBackbone", "BLIP2OptModel", "LLaVAModel", "PaLIGemmaModel",
    "VLMModel", "VLM_CONFIGS", "DecoderConfig", "QFormerConfig",
    "ViTConfig", "VLMConfig", "blip2_config", "llava_config",
    "paligemma_config", "Decoder", "init_decoder", "init_kv_cache",
    "VLMModelFactory", "ViTEncoder", "init_vit", "VLMModule", "init_vlm",
    "num_image_tokens",
]
