"""Free-running generation with per-step self-perplexity.

Shared machinery for the PPL smoke probes (reference
/root/reference/llava/eval/run_llava_for_ppl.py:134-144 and
model_vqa_science_for_ppl.py:132-141): at each decode step the "self"
log-probability is the max of the step's log-softmax — the greedy token's
probability regardless of how the next token is actually chosen — and the
reported perplexity is the mean of exp(-logp) over steps.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def generate_with_self_ppl(
    runtime,
    tokenizer,
    input_ids: np.ndarray,
    pixel_values,
    max_new_tokens: int = 512,
    temperature: float = 0.0,
    seed: int = 0,
) -> Dict:
    """Greedy/sampled generation that also records per-step self-PPL.

    Runs the per-token decode path (not the chunked scan) because the score
    of every step must be read on the host.
    """
    import jax
    import jax.numpy as jnp

    from ..generation.generate import GenerationConfig, Generator
    from ..multimodal.fusion import plan_batch

    gen = Generator(runtime.params, runtime.cfg,
                    GenerationConfig(max_new_tokens=max_new_tokens,
                                     temperature=temperature,
                                     eos_token_id=tokenizer.eos_token_id))
    plan = plan_batch([input_ids], runtime.cfg.num_image_tokens
                      if pixel_values is not None else 0)
    state, _ = gen.prefill_from_plan(plan, pixel_values, max_new_tokens)

    rng = jax.random.key(seed)
    tokens: List[int] = []
    step_ppls: List[float] = []
    for _ in range(max_new_tokens):
        logits = np.asarray(state.last_logits[0], np.float32)
        logp = logits - logits.max()
        logp = logp - np.log(np.sum(np.exp(logp)))
        step_ppls.append(float(np.exp(-logp.max())))
        if temperature > 0:
            rng, sub = jax.random.split(rng)
            tok = int(jax.random.categorical(sub, jnp.asarray(logits / temperature)))
        else:
            tok = int(np.argmax(logits))
        if tok == tokenizer.eos_token_id:
            break
        tokens.append(tok)
        state = gen._decode(gen.params, gen.cfg, jnp.asarray([tok]), state)

    return {
        "tokens": tokens,
        "text": tokenizer.decode(tokens, skip_special_tokens=True).strip(),
        "self_ppl": float(np.mean(step_ppls)) if step_ppls else 0.0,
        "answer_token_len": len(tokens),
    }


def prepare_image_prompt(qs: str, runtime_cfg, image_path: Optional[str],
                         image_processor, conv_mode: str, tokenizer):
    """Wrap a question with the image token + conversation template and
    tokenize; returns (input_ids, pixel_values)."""
    from PIL import Image

    from ..constants import DEFAULT_IMAGE_TOKEN
    from ..conversation import conv_templates
    from ..mm_utils import process_images, tokenizer_image_token

    pixels = None
    if image_path is not None:
        image = Image.open(image_path).convert("RGB")
        pixels = process_images([image], image_processor, runtime_cfg)
        qs = DEFAULT_IMAGE_TOKEN + "\n" + qs
    conv = conv_templates[conv_mode].copy()
    conv.append_message(conv.roles[0], qs)
    conv.append_message(conv.roles[1], None)
    ids = np.asarray(tokenizer_image_token(conv.get_prompt(), tokenizer),
                     np.int64)
    return ids, pixels
