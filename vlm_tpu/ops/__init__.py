"""TPU compute ops: attention, quantized matmuls, image preprocessing."""

from .attention import attention
from .preprocess import (RECIPES, PreprocessRecipe, host_batch, host_resize,
                         normalize_images, preprocess_pil_batch, recipe_for)
from .quant import (QuantizedWeight, dequantize, quant_matmul,
                    quant_matmul_dynamic, quantize_activations,
                    quantize_int4, quantize_int8)

__all__ = [
    "attention", "RECIPES", "PreprocessRecipe",
    "host_batch", "host_resize", "normalize_images", "preprocess_pil_batch",
    "recipe_for", "QuantizedWeight", "dequantize", "quant_matmul",
    "quant_matmul_dynamic", "quantize_activations", "quantize_int4",
    "quantize_int8",
]
