"""Learned-vs-random pruning at the PRODUCTION boundary (sparse_layer=2).

`run/sparse_quality.py` ablates at sparse_layer=0 because its one-signal
task washes out at any deeper boundary: layers 0..sl-1 (and the pre cache
tier at decode) always see the full image, and ONE attention hop suffices
to pool the single signal patch into the text stream — so pruning at
layer 2 can never bite, no matter the model depth. The reference's
production configuration prunes at layer 2 of 32
(`dynamic_modeling_llama.py:1586-1647` + sparse config), so the method's
quality story needs a toy where the post-tier tokens are load-bearing AT
sl=2.

This harness constructs exactly that: a CONTENT-ADDRESSED POINTER CHASE.
Every used patch is [ID half | payload half]; the chase starts at the
patch whose ID is pattern 0, whose payload is the ID of the next patch,
and so on for `hops` dereferences; the final patch's payload is one of
two class patterns = the yes/no answer. Distractor patches carry class
payloads under non-chain IDs (a global "find the class patch" shortcut
sees several and cannot answer) and pointer payloads (loudness does not
identify the chain). Resolving hop j needs one attention layer over
image tokens, so the answer needs hops+1 sequential lookups:

  * hops=1 -> 2 lookups, completable inside the sl=2 pre tier: pruning
    (learned OR random) should NOT separate — the harness's built-in
    negative control.
  * hops=2 -> 3 lookups: the final dereference can only happen at
    layers >= 2, where dropped tokens are GONE — the chain-end patch
    must survive pruning, and only a content-aware policy keeps it.

Training mirrors the reference pipeline (stage-1 dense "pretrained
LLaVA" stand-in, stage-2 Gumbel-policy sparse finetune through the real
train step) on FRESH data every step (fixed corpora memorize at this
scale); eval runs the real prefill/top-k/compaction path on held-out
samples. Reference parity anchors: VisionPredictor
`dynamic_modeling_llama.py:1897-1994`, mask losses `:2726-2800`.

CPU-runnable:
  python run/deep_sparse_quality.py --hops 2                  # full table
  python run/deep_sparse_quality.py --hops 2 --steps 8 --dense-steps 8 \
      --batch 8 --holdout 8                                   # smoke
"""

import argparse
import dataclasses
import json
import math
import os
import sys
from typing import Optional

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparse_quality import VOCAB, YES, NO, EOS  # shared tiny vocab

QUESTION = [1, VOCAB.index("Q"), VOCAB.index("is"), VOCAB.index("there"),
            VOCAB.index("a"), -200, VOCAB.index("signal"), VOCAB.index("?"),
            VOCAB.index("A")]


def build_patterns(rng, patch: int, alphabet: int, amp: float,
                   full: bool = False):
    """Pattern libraries: `alphabet` ID patterns + 2 class patterns, all
    amp-normalized so loudness carries no information. ``full=False``
    gives half-patch-wide patterns (the "halves" tile layout);
    ``full=True`` gives whole-patch patterns (the "additive" layout)."""
    import numpy as np

    def norm(x):
        return amp * x / np.abs(x).max(axis=(1, 2, 3), keepdims=True)

    w = patch if full else patch // 2
    ids = norm(rng.normal(size=(alphabet, patch, w, 3)).astype(np.float32))
    cls = norm(rng.normal(size=(2, patch, w, 3)).astype(np.float32))
    return ids, cls


def build_corpus(n: int, image_size: int, patch: int, seed: int = 0,
                 noise: float = 0.5, amp: float = 2.5, hops: int = 2,
                 class_distractors: int = 4, pointer_distractors: int = 2,
                 alphabet: int = 16, encoding: str = "halves",
                 pointer_coeff: float = 0.6):
    """n samples of the ID-chain chase. Returns (prompts, answers, imgs,
    chain_pos [n, hops+1] grid positions of the chain patches in order,
    labels_txt).

    Tile encodings:
      * ``halves``: [ID half | payload half]. The dynamic hop-2 lookup
        must map a payload-half embedding onto an ID-half embedding — an
        arbitrary learned rotation with no initial gradient; measured:
        depths >= 1 stay pinned at chance through curriculum training.
      * ``additive``: tile = ID + pointer_coeff * payload, one shared
        whole-patch library. Retrieved pointer content then matches the
        target's key IN THE SAME pattern subspace (no cross-half
        rotation to learn); `pointer_coeff` (relative amplitude within
        an amp-normalized tile) disambiguates own-ID from pointer."""
    import numpy as np

    rng = np.random.default_rng(seed)
    g = image_size // patch
    n_patches = g * g
    id_pat, cls_pat = build_patterns(rng, patch, alphabet, amp,
                                     full=(encoding == "additive"))
    n_chain = hops + 1
    n_used = n_chain + class_distractors + pointer_distractors
    assert n_used <= n_patches and n_used <= alphabet

    prompts, answers, imgs, chain_pos, labels_txt = [], [], [], [], []
    for i in range(n):
        c = i % 2
        img = rng.normal(scale=noise,
                         size=(image_size, image_size, 3)).astype(np.float32)
        pos = rng.permutation(n_patches)[:n_used]
        # unique IDs; index 0 of `ids_` is the chase start (ID pattern 0)
        ids_ = np.concatenate(
            [[0], 1 + rng.permutation(alphabet - 1)[: n_used - 1]])

        def put(p, id_idx, payload):
            r, col = divmod(int(p), g)
            if encoding == "additive":
                tile = id_pat[id_idx] + pointer_coeff * payload
            else:
                tile = np.concatenate([id_pat[id_idx], payload], axis=1)
            tile = tile + rng.normal(
                scale=0.1, size=tile.shape).astype(np.float32)
            img[r * patch:(r + 1) * patch,
                col * patch:(col + 1) * patch, :] = tile

        # chain: patch with ID ids_[j] points (payload) at ID ids_[j+1];
        # the last chain patch's payload is the class pattern
        for j in range(hops):
            put(pos[j], ids_[j], id_pat[ids_[j + 1]])
        put(pos[hops], ids_[hops], cls_pat[c])
        k = n_chain
        for _ in range(class_distractors):
            put(pos[k], ids_[k], cls_pat[rng.integers(2)])
            k += 1
        for _ in range(pointer_distractors):
            put(pos[k], ids_[k], id_pat[rng.integers(1, alphabet)])
            k += 1

        prompts.append(np.asarray(QUESTION, np.int64))
        ans = YES if c == 0 else NO
        answers.append(np.asarray([ans, EOS], np.int64))
        imgs.append(img)
        chain_pos.append(pos[:n_chain].copy())
        labels_txt.append("yes" if ans == YES else "no")
    return (prompts, answers, np.stack(imgs), np.asarray(chain_pos),
            labels_txt)


def make_cfg(hidden: int, layers: int, keep_rate: float, sparse_layer: int,
             use_vision_predictor: bool = True, image_size: int = 70,
             patch: int = 14, pred_layers: int = 3):
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
            hidden_size=48, intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=2, image_size=image_size, patch_size=patch,
        ),
        sparse=SparseConfig(
            # 3 bidirectional predictor blocks: tracing an m-hop chain
            # needs m+1 propagation steps; the LM pre-prune layers give
            # the predictor's INPUT a head start but not the full chase
            d_model=48, nhead=2, dim_feedforward=96, num_layers=pred_layers,
            use_vision_predictor=use_vision_predictor,
            vision_keep_rate=keep_rate,
            use_text_predictor=False,
            use_output_text_predictor=False,
            use_instruct_predictor=False,
            sparse_layer=sparse_layer,
        ),
    )


def hops_schedule(steps: int, max_hops: int):
    """Curriculum over chain depth: hop-h circuits compose the hop-(h-1)
    machinery (ID match -> payload read), but the h-hop task alone gives
    a from-scratch learner no gradient until the whole chain is traced —
    measured: 1400 steps of direct hops=2 training stay at exact chance
    (answer-token loss ln2). The schedule unlocks depth d at step
    d/(max_hops+1) of the run and then CYCLES every unlocked depth so
    earlier circuits are never forgotten (fresh data per step makes train
    loss = generalization loss per depth)."""
    sched = []
    for i in range(steps):
        unlocked = min(max_hops,
                       int((max_hops + 1) * i / max(steps, 1)))
        sched.append(i % (unlocked + 1))
    return sched


def train_fresh(cfg, steps: int, batch_size: int, seed: int,
                image_size: int, patch: int, hops: int,
                params=None, log_every: int = 0, lr: float = 3e-3,
                base_lr: Optional[float] = None,
                corpus_kw=None, curriculum: bool = True):
    """Stage trainer on fresh per-step batches through the real train
    step (Gumbel policy + mask-ratio loss when the predictor is on).
    ``curriculum=True`` trains on mixed chain depths 0..hops (see
    hops_schedule); the returned per-depth losses are each depth's last
    fresh-batch train loss."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dynamic_llava_tpu.models import dynamic
    from dynamic_llava_tpu.multimodal.fusion import plan_batch
    from dynamic_llava_tpu.train.optimizer import (
        gumbel_tau_schedule,
        label_params,
        make_optimizer,
    )
    from dynamic_llava_tpu.train.step import batch_from_plan, make_train_step

    if params is None:
        params = dynamic.init_llava_params(jax.random.key(seed), cfg,
                                           jnp.float32)
    if curriculum == "cycle" and hops:  # all depths from step 0
        sched = [i % (hops + 1) for i in range(steps)]
    elif curriculum and hops:  # progressive unlock
        sched = hops_schedule(steps, hops)
    else:
        sched = [hops] * steps
    corpora = {}
    for h in sorted(set(sched)):
        n_h = sum(1 for s in sched if s == h)
        prompts, answers, imgs, _, _ = build_corpus(
            n_h * batch_size, image_size, patch, seed=seed + 54321 + h,
            hops=h, **(corpus_kw or {}),
        )
        ids, labels = [], []
        for p, a in zip(prompts, answers):
            row = np.concatenate([p, a])
            lab = row.copy()
            lab[: len(p)] = -100
            ids.append(row)
            labels.append(lab)
        corpora[h] = {"ids": ids, "labels": labels, "imgs": imgs, "next": 0}

    opt = make_optimizer(base_lr=lr if base_lr is None else base_lr,
                         predictor_lr=lr)
    step = make_train_step(cfg, opt, remat=False, labels=label_params(params))
    opt_state = opt.init(params)
    tau_fn = gumbel_tau_schedule(1.0, 0.1, max(steps, 1))
    last_loss = {}
    for i in range(steps):
        h = sched[i]
        c = corpora[h]
        lo = c["next"] * batch_size
        hi = lo + batch_size
        c["next"] += 1
        plan = plan_batch(c["ids"][lo:hi], cfg.num_image_tokens,
                          labels_list=c["labels"][lo:hi])
        batch = batch_from_plan(plan, c["imgs"][lo:hi])
        params, opt_state, m = step(
            params, opt_state, batch, jax.random.key(100 + i),
            jnp.float32(tau_fn(i)),
        )
        last_loss[h] = float(m["lm_loss"])
        if log_every and (i + 1) % log_every == 0:
            per_h = " ".join(f"h{k}:{v:.4f}"
                             for k, v in sorted(last_loss.items()))
            print(f"# step {i + 1}: loss {float(m['loss']):.4f} "
                  f"lm_loss by depth [{per_h}]", file=sys.stderr)
    return params, last_loss


def eval_arm(params, cfg, prompts, answers, imgs, chain_pos, labels_txt,
             score_override=None):
    """Held-out eval through the real prefill/top-k/compaction path;
    reports PPL/acc plus per-chain-position survival."""
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
    ans = np.stack(answers)
    logits1 = np.asarray(state.last_logits, np.float32)
    state = decode(params, cfg, jnp.asarray(ans[:, 0], jnp.int32), state)
    logits2 = np.asarray(state.last_logits, np.float32)

    def logp(lg):
        lg = lg - lg.max(axis=-1, keepdims=True)
        return lg - np.log(np.exp(lg).sum(axis=-1, keepdims=True))

    lp1, lp2 = logp(logits1), logp(logits2)
    nll = -(lp1[np.arange(b), ans[:, 0]] + lp2[np.arange(b), ans[:, 1]])
    ppl = math.exp(float(nll.mean()) / 2.0)
    greedy = logits1.argmax(axis=-1)
    texts = [VOCAB[t] if 0 <= t < len(VOCAB) else "none" for t in greedy]
    pope = score_pope(texts, labels_txt)

    row = {
        "holdout_answer_ppl": round(ppl, 4),
        "pope_accuracy_holdout": round(pope["accuracy"], 4),
        "pope_f1_holdout": round(pope["f1"], 4),
    }
    if info.image_keep_mask is not None:
        mask = np.asarray(info.image_keep_mask)
        img_start = np.asarray(plan.spans.image_start)
        for j in range(chain_pos.shape[1]):
            kept = mask[np.arange(b), img_start + chain_pos[:, j]]
            row[f"chain{j}_kept"] = round(float(kept.mean()), 4)
        row["chain_end_kept"] = row[f"chain{chain_pos.shape[1] - 1}_kept"]
    else:
        row["chain_end_kept"] = None
    return row


def run_all(steps: int, dense_steps: int, batch: int, holdout: int,
            hidden: int, layers: int, sparse_layer: int, hops: int,
            seed: int = 0, log_every: int = 0, pred_layers: int = 3,
            corpus_kw=None, stage2_base_lr: Optional[float] = 7.5e-5):
    import numpy as np

    import jax

    from dynamic_llava_tpu.models.predictors import init_predictors

    image_size, patch = 70, 14
    cfg = make_cfg(hidden, layers, 0.2, sparse_layer,
                   pred_layers=pred_layers)
    n_img = cfg.num_image_tokens

    dense_cfg = make_cfg(hidden, layers, 1.0, sparse_layer,
                         use_vision_predictor=False,
                         pred_layers=pred_layers)
    params, loss1 = train_fresh(
        dense_cfg, dense_steps, batch, seed, image_size, patch, hops,
        log_every=log_every, corpus_kw=corpus_kw,
    )
    print(f"# stage 1 (dense, hops-curriculum): {dense_steps} steps, "
          f"lm_loss by depth {loss1}", file=sys.stderr)
    params = dict(params)
    params["predictors"] = init_predictors(
        jax.random.key(seed + 1), cfg.text, cfg.sparse, jax.numpy.float32,
    )
    # stage-2 lr split mirrors the reference recipe
    # (run/train_dynamic_llava_7b.sh: base 5e-6, predictors 2e-4 — a 40x
    # ratio): a near-frozen base cannot CE-unlearn its image reliance
    # faster than the predictor locks onto the load-bearing patches.
    # Measured without the split: stage 2 collapses the learned depth-0
    # circuit to exact chance (mutual collapse — the Gumbel mask drops
    # the chain patch 80% of the time, the fast-moving base unlearns it,
    # and the predictor's keep-gradient vanishes with it).
    params, loss2 = train_fresh(
        cfg, steps, batch, seed + 1, image_size, patch, hops,
        params=params, log_every=log_every, corpus_kw=corpus_kw,
        curriculum="cycle", base_lr=stage2_base_lr,
    )
    print(f"# stage 2 (sparse finetune, depth cycle): {steps} steps, "
          f"lm_loss by depth {loss2}", file=sys.stderr)

    # ONE mixed-depth model, evaluated per chain depth — including depth
    # 0 when in range: whether even the LEARNED depth's read circuit
    # lands pre- or post-sparse_layer is itself the measurement
    rng = np.random.default_rng(seed + 7)
    all_rows, all_gaps = {}, {}
    for h in range(max(hops - 1, 0), hops + 1):
        prompts, answers, imgs, chain_pos, labels_txt = build_corpus(
            holdout, image_size, patch, seed=seed + 999_999 + h, hops=h,
            **(corpus_kw or {}),
        )
        ho_args = (prompts, answers, imgs, chain_pos, labels_txt)
        rows = {"dense": eval_arm(params, dense_cfg, *ho_args)}
        for rate in (0.2, 0.5):
            cfg_r = dataclasses.replace(
                cfg, sparse=dataclasses.replace(cfg.sparse,
                                                vision_keep_rate=rate))
            rows[f"learned@{rate}"] = eval_arm(params, cfg_r, *ho_args)
            rows[f"random@{rate}"] = eval_arm(
                params, cfg_r, *ho_args,
                score_override=rng.uniform(size=(holdout, n_img)),
            )
        for name, row in rows.items():
            print(json.dumps({"hops": h, "arm": name, **row}), flush=True)
        gaps = {
            f"learned_minus_random_acc@{r}": round(
                rows[f"learned@{r}"]["pope_accuracy_holdout"]
                - rows[f"random@{r}"]["pope_accuracy_holdout"], 4)
            for r in (0.2, 0.5)
        }
        print(json.dumps({"hops": h, "sparse_layer": sparse_layer,
                          "gaps": gaps}), flush=True)
        all_rows[h], all_gaps[h] = rows, gaps
    return all_rows, all_gaps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--dense-steps", dest="dense_steps", type=int,
                    default=1500)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--holdout", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--sparse-layer", dest="sparse_layer", type=int,
                    default=2)
    ap.add_argument("--hops", type=int, default=2)
    ap.add_argument("--pred-layers", dest="pred_layers", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=0)
    ap.add_argument("--encoding", choices=("halves", "additive"),
                    default="halves")
    ap.add_argument("--pointer-coeff", dest="pointer_coeff", type=float,
                    default=0.6)
    ap.add_argument("--stage2-base-lr", dest="stage2_base_lr", type=float,
                    default=7.5e-5,
                    help="stage-2 base-LM lr (predictors stay at 3e-3; "
                         "the reference recipe's 40x split)")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    run_all(args.steps, args.dense_steps, args.batch, args.holdout,
            args.hidden, args.layers, args.sparse_layer, args.hops,
            seed=args.seed, log_every=args.log_every,
            pred_layers=args.pred_layers,
            corpus_kw={"encoding": args.encoding,
                       "pointer_coeff": args.pointer_coeff},
            stage2_base_lr=args.stage2_base_lr)


if __name__ == "__main__":
    main()
