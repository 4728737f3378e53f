"""Model registry (reference llava/model/__init__.py + AutoConfig
registration, dynamic_llava_llama.py:172-173). Architectures are keyed by
the HF ``model_type`` strings so reference checkpoints resolve."""

from .builder import LlavaRuntime, llava_config_from_hf_dict, load_pretrained_model  # noqa: F401

MODEL_REGISTRY = {
    "llava_llama": "dense LLaVA-1.5 (predictors off)",
    "dynamic_llava_llama": "Dynamic-LLaVA (sparsification per config.sparse_config)",
    "llama": "text-only LLaMA/Vicuna decoder",
    "llava_mistral": "dense LLaVA on Mistral (GQA + sliding window; "
    "LlamaConfig.sliding_window — see tests/test_mistral_parity.py)",
    "mistral": "text-only Mistral decoder (same stack as llama)",
    "llava_mpt": "dense LLaVA on MPT (ALiBi decoder, models/mpt.py)",
    "mpt": "text-only MPT decoder (models/mpt.py)",
}
