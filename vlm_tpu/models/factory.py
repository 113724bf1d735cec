"""VLM model factory (reference parity:
`/root/reference/models/model_factory.py:7-58`)."""

from __future__ import annotations

from typing import Optional

from .base_model import BLIP2OptModel, LLaVAModel, PaLIGemmaModel, VLMModel


class VLMModelFactory:
    """Registry of VLM families by symbolic name."""

    _registry = {
        "blip2": BLIP2OptModel,
        "llava": LLaVAModel,
        "paligemma": PaLIGemmaModel,
    }

    @staticmethod
    def create_model(model_name: str, model_id: Optional[str] = None,
                     device=None, quantization: str = "fp32",
                     **kwargs) -> VLMModel:
        """Instantiate a VLM by name.

        Args:
            model_name: "blip2" | "llava" | "paligemma".
            model_id: optional local checkpoint/safetensors directory
                (replaces the reference's HF hub id — this framework never
                downloads).
            device: ignored (placement is mesh-driven); kept for signature
                parity with the reference factory (model_factory.py:20).
            quantization: fp32 | fp16/bf16 | 8bit | 4bit.
        """
        model_name = model_name.lower()
        if model_name not in VLMModelFactory._registry:
            raise ValueError(
                f"Model '{model_name}' not found. Available: "
                f"{list(VLMModelFactory._registry.keys())}")
        return VLMModelFactory._registry[model_name](
            model_id, device, quantization, **kwargs)

    @staticmethod
    def get_available_models():
        return list(VLMModelFactory._registry.keys())


if __name__ == "__main__":
    # Smoke check, mirroring the reference's __main__ block
    # (model_factory.py:53-58) — tiny variant, no weights needed.
    print("Available models:", VLMModelFactory.get_available_models())
    model = VLMModelFactory.create_model("blip2", size="test")
    print("blip2 test-variant instantiated:", type(model).__name__)
