"""Learned-vs-random sparsification quality: the method's quality proxy.

The reference's entire accuracy story is benchmark tables showing the
LEARNED predictors (VisionPredictor top-k selection,
/root/reference/llava/model/language_model/dynamic_modeling_llama.py:1897-1994,
trained with the mask-ratio losses :2726-2800) lose <=0.5 pt vs dense.
Real weights are environment-blocked, so this harness produces the
obtainable evidence at toy scale: a task where WHICH image tokens survive
pruning decides the answer, trained through the real Gumbel-policy train
step, then ablated at inference through the real prefill/top-k/compaction
path.

Task: a 5x5-patch image is noise except ONE signal patch (position random
per sample) carrying one of two class patterns; the question is fixed and
the yes/no answer is the patch's class. A learned vision predictor must
keep the signal patch at keep-rate 0.2 (5 of 25 tokens); random pruning
keeps it w.p. ~0.2, so held-out accuracy separates cleanly.

Arms (all through the identical prefill path; scores differ):
  * dense       — no pruning (use_vision_predictor off)
  * learned@r   — trained predictor, top-k at keep rate r in {0.2, 0.5}
  * random@r    — per-sample uniform-random scores via the
                  ``vision_score_override`` ablation hook (same top-k,
                  same compaction, same downstream compute)
  * untrained@r — freshly-initialized predictor weights (content-based but
                  meaningless scores)

Metrics per arm, on HELD-OUT samples (unseen noise + positions):
teacher-forced answer PPL through prefill+decode, greedy-answer POPE
accuracy (eval_pope.score_pope), answer-position margin, and the fraction
of samples whose signal patch survived pruning (PrefillInfo.image_keep_mask).

CPU-runnable:
  python run/sparse_quality.py --steps 300            # full table
  python run/sparse_quality.py --steps 8 --pairs 8    # smoke

CI gate: tests/test_sparse_quality_gate.py asserts learned@0.2 beats
random@0.2 with a quantified gap.
"""

import argparse
import dataclasses
import json
import os
import sys
from typing import Optional

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

VOCAB = "<pad> <s> </s> Q A yes no is there a signal ? .".split()
YES, NO = VOCAB.index("yes"), VOCAB.index("no")
EOS = 2


def build_corpus(n: int, image_size: int, patch: int, seed: int = 0,
                 noise: float = 0.5, amp: float = 2.5, distractors: int = 6):
    """n samples: image noise everywhere except ONE signal patch (whose
    class pattern decides the yes/no answer) plus ``distractors``
    same-amplitude random-pattern patches. The distractors matter: without
    them, a single pre-prune attention layer can stash 'the one loud
    patch' into the text tokens and pruning never bites; with them, only
    CONTENT (does this patch look like a class pattern?) identifies the
    signal — the function the predictor must learn."""
    import numpy as np

    rng = np.random.default_rng(seed)
    g = image_size // patch
    n_patches = g * g
    # two fixed class patterns, drawn once; strong amplitude so the tiny
    # tower can separate them from noise
    pat = rng.normal(size=(2, patch, patch, 3)).astype(np.float32)
    pat = amp * pat / np.abs(pat).max(axis=(1, 2, 3), keepdims=True)

    q = [1, VOCAB.index("Q"), VOCAB.index("is"), VOCAB.index("there"),
         VOCAB.index("a"), -200, VOCAB.index("signal"), VOCAB.index("?"),
         VOCAB.index("A")]
    prompts, answers, imgs, sig_pos, labels_txt = [], [], [], [], []
    for i in range(n):
        cls = i % 2
        perm = rng.permutation(n_patches)
        pos = int(perm[0])
        img = rng.normal(scale=noise,
                         size=(image_size, image_size, 3)).astype(np.float32)

        def put(p, tile):
            r, c = divmod(int(p), g)
            img[r * patch:(r + 1) * patch, c * patch:(c + 1) * patch, :] = tile

        put(pos, pat[cls] + rng.normal(scale=0.1, size=(patch, patch, 3)))
        for p in perm[1:1 + distractors]:
            d = rng.normal(size=(patch, patch, 3)).astype(np.float32)
            put(p, amp * d / np.abs(d).max())
        prompts.append(np.asarray(q, np.int64))
        ans = YES if cls == 0 else NO
        answers.append(np.asarray([ans, EOS], np.int64))
        imgs.append(img)
        sig_pos.append(pos)
        labels_txt.append("yes" if ans == YES else "no")
    return (prompts, answers, np.stack(imgs), np.asarray(sig_pos),
            labels_txt)


def train_sparse(cfg, prompts, answers, imgs, steps: int, seed: int = 0,
                 log_every: int = 0, params=None):
    """Train through the real train step (Gumbel policy attention +
    mask-ratio loss when predictors are on). ``params`` continues from a
    checkpoint — the reference's staging: the sparse stage FINETUNES a
    pretrained model (run/train_dynamic_llava_7b.sh), it never trains
    predictors jointly from scratch (measured here: joint-from-scratch
    collapses — the mask-ratio loss locks the predictor onto arbitrary
    tokens before the LM can read the image)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dynamic_llava_tpu.models import dynamic
    from dynamic_llava_tpu.multimodal.fusion import plan_batch
    from dynamic_llava_tpu.train.optimizer import label_params, make_optimizer
    from dynamic_llava_tpu.train.step import batch_from_plan, make_train_step

    if params is None:
        params = dynamic.init_llava_params(
            jax.random.key(seed), cfg, jnp.float32
        )
    ids, labels = [], []
    for p, a in zip(prompts, answers):
        row = np.concatenate([p, a])
        lab = row.copy()
        lab[: len(p)] = -100
        ids.append(row)
        labels.append(lab)
    plan = plan_batch(ids, cfg.num_image_tokens, labels_list=labels)
    batch = batch_from_plan(plan, imgs)
    opt = make_optimizer(base_lr=3e-3, predictor_lr=3e-3)
    step = make_train_step(cfg, opt, remat=False, labels=label_params(params))
    opt_state = opt.init(params)
    loss = None
    for i in range(steps):
        params, opt_state, m = step(
            params, opt_state, batch, jax.random.key(100 + i),
            jnp.float32(0.5)
        )
        if log_every and (i + 1) % log_every == 0:
            print(f"# step {i + 1}: lm_loss {float(m['lm_loss']):.4f} "
                  f"loss {float(m['loss']):.4f}", file=sys.stderr)
        loss = float(m["lm_loss"])
    return params, loss


def eval_arm(params, cfg, prompts, answers, imgs, sig_pos, labels_txt,
             score_override=None):
    """Batched prefill + teacher-forced decode on the held-out set.

    Returns PPL over answer tokens, POPE accuracy of the greedy answer,
    answer-position margin, and signal-patch survival rate (None when the
    arm does not prune)."""
    import math

    import numpy as np

    import jax
    import jax.numpy as jnp

    from dynamic_llava_tpu.eval.eval_pope import score_pope
    from dynamic_llava_tpu.models import dynamic
    from dynamic_llava_tpu.multimodal.fusion import plan_batch

    plan = plan_batch(list(prompts), cfg.num_image_tokens)
    b = plan.batch
    cache = dynamic.make_gen_cache(cfg, b, plan.seq_len, 8, jnp.float32)
    prefill = jax.jit(dynamic.prefill, static_argnums=(1,),
                      static_argnames=("all_have_image",))
    decode = jax.jit(dynamic.decode_step, static_argnums=(1,))
    kwargs = {}
    if score_override is not None:
        kwargs["vision_score_override"] = jnp.asarray(score_override)
    state, info = prefill(
        params, cfg,
        jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
        jnp.asarray(plan.spans.image_start),
        jnp.asarray(plan.spans.last_instruct_start),
        jnp.asarray(plan.spans.last_instruct_end),
        jnp.asarray(plan.spans.has_image),
        jnp.asarray(imgs), cache, **kwargs,
    )
    ans = np.stack(answers)  # [B, 2] answer token + </s>
    logits1 = np.asarray(state.last_logits, np.float32)  # predicts answer
    state = decode(params, cfg, jnp.asarray(ans[:, 0], jnp.int32), state)
    logits2 = np.asarray(state.last_logits, np.float32)  # predicts </s>

    def logp(lg):
        lg = lg - lg.max(axis=-1, keepdims=True)
        return lg - np.log(np.exp(lg).sum(axis=-1, keepdims=True))

    lp1, lp2 = logp(logits1), logp(logits2)
    nll = -(lp1[np.arange(b), ans[:, 0]] + lp2[np.arange(b), ans[:, 1]])
    ppl = math.exp(float(nll.mean()) / 2.0)

    top2 = np.partition(logits1, -2, axis=-1)[:, -2:]
    margin = float((top2[:, 1] - top2[:, 0]).mean())

    greedy = logits1.argmax(axis=-1)
    texts = [VOCAB[t] if 0 <= t < len(VOCAB) else "none" for t in greedy]
    pope = score_pope(texts, labels_txt)

    keep_rate = None
    if info.image_keep_mask is not None:
        mask = np.asarray(info.image_keep_mask)
        img_start = np.asarray(plan.spans.image_start)
        kept = mask[np.arange(b), img_start + np.asarray(sig_pos)]
        keep_rate = float(kept.mean())
    return {
        "holdout_answer_ppl": round(ppl, 4),
        "pope_accuracy_holdout": round(pope["accuracy"], 4),
        "pope_f1_holdout": round(pope["f1"], 4),
        "answer_margin": round(margin, 4),
        "signal_patch_kept": (None if keep_rate is None
                              else round(keep_rate, 4)),
    }


def make_cfg(hidden: int, layers: int, keep_rate: float,
             use_vision_predictor: bool = True, image_size: int = 70,
             patch: int = 14, sparse_layer: int = 1):
    from dynamic_llava_tpu.config import (
        ClipVisionConfig,
        LlamaConfig,
        LlavaConfig,
        SparseConfig,
    )

    return LlavaConfig(
        text=LlamaConfig(
            vocab_size=len(VOCAB), hidden_size=hidden,
            intermediate_size=hidden * 2, num_hidden_layers=layers,
            num_attention_heads=4, num_key_value_heads=4,
        ),
        vision=ClipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=image_size, patch_size=patch,
        ),
        sparse=SparseConfig(
            d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
            use_vision_predictor=use_vision_predictor,
            vision_keep_rate=keep_rate,
            use_text_predictor=False,
            use_output_text_predictor=False,
            use_instruct_predictor=False,
            # prune EARLY relative to depth: layers < sparse_layer (and the
            # pre cache tier at decode) always see the full image, so a
            # deep sparse tier is what makes pruning consequential — the
            # reference's production ratio is sl=2 of 32 layers
            sparse_layer=sparse_layer,
        ),
    )


def run_all(steps: int, pairs: int, holdout: int, hidden: int, layers: int,
            seed: int = 0, log_every: int = 0, sparse_layer: int = 0,
            dense_steps: Optional[int] = None):
    import numpy as np

    import jax

    from dynamic_llava_tpu.models.predictors import init_predictors

    cfg = make_cfg(hidden, layers, 0.2, sparse_layer=sparse_layer)
    image_size, patch = cfg.vision.image_size, cfg.vision.patch_size
    n_img = cfg.num_image_tokens

    prompts, answers, imgs, sig_pos, labels = build_corpus(
        pairs + holdout, image_size, patch, seed=seed
    )
    tr, ho = slice(0, pairs), slice(pairs, pairs + holdout)

    # Stage 1 (the reference's pretrained-LLaVA stand-in): train DENSE
    # until the model reads the image. Stage 2 then adds predictors and
    # finetunes with the Gumbel policy — the reference's actual pipeline
    # (run/train_dynamic_llava_7b.sh finetunes an existing checkpoint).
    dense_steps = steps if dense_steps is None else dense_steps
    dense_train_cfg = make_cfg(hidden, layers, 1.0,
                               use_vision_predictor=False,
                               sparse_layer=sparse_layer)
    params, loss1 = train_sparse(
        dense_train_cfg, prompts[tr], answers[tr], imgs[tr], dense_steps,
        seed=seed, log_every=log_every,
    )
    print(f"# stage 1 (dense): {dense_steps} steps, lm_loss {loss1:.4f}",
          file=sys.stderr)
    params = dict(params)
    params["predictors"] = init_predictors(
        jax.random.key(seed + 1), cfg.text, cfg.sparse, jax.numpy.float32
    )
    params, lm_loss = train_sparse(
        cfg, prompts[tr], answers[tr], imgs[tr], steps, seed=seed,
        log_every=log_every, params=params,
    )
    print(f"# stage 2 (sparse finetune): {steps} steps on {pairs} pairs "
          f"({holdout} held out), final lm_loss {lm_loss:.4f}",
          file=sys.stderr)

    ho_args = (prompts[ho], answers[ho], imgs[ho], sig_pos[ho], labels[ho])
    rng = np.random.default_rng(seed + 7)
    rows = {}

    # dense reference: predictors off, no pruning
    dense_cfg = make_cfg(hidden, layers, 1.0, use_vision_predictor=False,
                         sparse_layer=sparse_layer)
    rows["dense"] = eval_arm(params, dense_cfg, *ho_args)

    for rate in (0.2, 0.5):
        cfg_r = dataclasses.replace(
            cfg, sparse=dataclasses.replace(cfg.sparse,
                                            vision_keep_rate=rate))
        rows[f"learned@{rate}"] = eval_arm(params, cfg_r, *ho_args)
        rows[f"random@{rate}"] = eval_arm(
            params, cfg_r, *ho_args,
            score_override=rng.uniform(size=(holdout, n_img)),
        )

    # untrained predictor: fresh init, content-based but meaningless scores
    up = dict(params)
    up["predictors"] = init_predictors(
        jax.random.key(seed + 99), cfg.text, cfg.sparse,
        jax.numpy.float32,
    )
    cfg02 = dataclasses.replace(
        cfg, sparse=dataclasses.replace(cfg.sparse, vision_keep_rate=0.2))
    rows["untrained@0.2"] = eval_arm(up, cfg02, *ho_args)

    for name, row in rows.items():
        print(json.dumps({"arm": name, **row}), flush=True)
    gaps = {
        f"learned_minus_random_acc@{r}": round(
            rows[f"learned@{r}"]["pope_accuracy_holdout"]
            - rows[f"random@{r}"]["pope_accuracy_holdout"], 4)
        for r in (0.2, 0.5)
    }
    print(json.dumps({"summary": rows, "gaps": gaps}))
    return rows, gaps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--holdout", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=96)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dense-steps", dest="dense_steps", type=int,
                    default=None, help="stage-1 dense pretrain steps "
                                       "(default: same as --steps)")
    ap.add_argument("--log-every", type=int, default=0)
    ap.add_argument("--sparse-layer", dest="sparse_layer", type=int,
                    default=0,
                    help="prune entering this layer; 0 = the embedding "
                         "boundary, the only setting where dropped tokens "
                         "are invisible to EVERY layer (at toy depth any "
                         "pre-prune layer — and the pre cache tier at "
                         "decode — re-encodes the answer into text tokens "
                         "and pruning never bites; measured, see "
                         "docs/BENCHMARKS.md)")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the accelerator (default: CPU — the model "
                         "is tiny and the single TPU tunnel serves one "
                         "client)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    run_all(args.steps, args.pairs, args.holdout, args.hidden, args.layers,
            seed=args.seed, log_every=args.log_every,
            sparse_layer=args.sparse_layer, dense_steps=args.dense_steps)


if __name__ == "__main__":
    main()
