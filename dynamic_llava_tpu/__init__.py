"""dynamic_llava_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of Dynamic-LLaVA: efficient multimodal LLMs via dynamic
vision-language context sparsification.

One stack, sparsification toggleable by config (SURVEY.md §7 delta 2): with
predictors disabled / keep rates at 1.0 the model reproduces the dense
LLaVA-1.5 baseline; with them enabled it prunes image tokens at prefill and
output-text KV entries at decode using static-shape kernels.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    ClipVisionConfig,
    DENSE_SPARSE_CONFIG,
    LlamaConfig,
    LlavaConfig,
    SparseConfig,
)
