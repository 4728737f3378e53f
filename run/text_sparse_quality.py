"""Learned-vs-random OUTPUT-TEXT (decode-KV) sparsification quality.

The method's second half: at decode time the output-text predictor decides,
per generated token, whether its K/V persists in the sparse-tier cache
(reference E3, /root/reference/llava/model/language_model/
dynamic_modeling_llama.py:2377-2391, cache mechanism cache_utils.py:150-241),
trained with the T2 Gumbel policy + mask-ratio loss (:2006-2133, :2745-2772).
`run/sparse_quality.py` proves the VISION predictor learns; this harness
produces the matching evidence for the decode-KV predictor — real weights
are environment-blocked, so at toy scale with the real code paths end to end.

Task (generate-then-restate): the "generation" is an answer of M filler
tokens (M random per sample), then K payload tokens, then a separator,
then the K payload tokens RESTATED in order:

    prompt:  <s> Q copy A
    answer:  F1 F6 F2 F4 F1 P3 P0 ; P3 P0 </s>

Payload values are random per sample, so the restatement after ";" is
predictable ONLY from the earlier generated tokens — i.e. from their KV.
Fillers are noise (see build_corpus for why the layout and the random
filler count are load-bearing design points). A learned predictor that
keeps payload KV and drops filler KV preserves recall; random per-token
dropping at the same rate loses payload KV and recall collapses toward
chance (1/|payload alphabet| per token).

Arms (identical E3 persist/advance path; only the keep DECISION differs):
  * dense        — no decode-KV pruning (use_output_text_predictor off)
  * learned      — trained predictor thresholds (tp[0] > tp[1])
  * random@match — per-step Bernoulli keep at the learned arm's measured
                   keep rate, via ``decode_step(output_text_keep_override=)``
  * untrained    — freshly-initialized predictor (content-based, meaningless)

Eval is teacher-forced through the REAL paths: ``dynamic.prefill`` on the
prompt, then one ``dynamic.decode_step`` per answer token — each step's
keep decision persists or drops that token's sparse-tier KV exactly as in
production decode. Metrics on HELD-OUT samples (unseen payload draws):
recall-segment PPL and greedy accuracy, plus payload/filler KV survival
(recovered from per-step post-tier length advances).

Training mirrors the reference staging: stage 1 trains the LM dense until
it can do the copy task (the "pretrained LLaVA" stand-in), stage 2 adds
the predictor and finetunes through the Gumbel policy train step.

CPU-runnable:
  python run/text_sparse_quality.py                        # full table
  python run/text_sparse_quality.py --steps 10 --batch 8 --holdout 8

CI gate: tests/test_sparse_quality_gate.py::test_learned_text_pruning_beats_random
"""

import argparse
import dataclasses
import json
import os
import sys
from typing import Optional

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# vocab: specials + payload alphabet + filler alphabet
SPECIALS = "<pad> <s> </s> Q copy A ;".split()
N_PAYLOAD = 8
N_FILLER = 8
PAY0 = len(SPECIALS)
FIL0 = PAY0 + N_PAYLOAD
VOCAB_SIZE = FIL0 + N_FILLER
EOS = 2
SEP = SPECIALS.index(";")
PROMPT = [1, SPECIALS.index("Q"), SPECIALS.index("copy"), SPECIALS.index("A")]


class Corpus:
    """Padded answers plus per-sample category masks (variable lengths).

    ``answers[i]`` = [F b1..bm_i, P a1..ak, SEP, a1..ak, EOS, pad...] with
    m_i random per sample. logits[j] predicts answers[:, j]; masks are in
    those answer coordinates.
    """

    def __init__(self, answers, lengths, payload_mask, filler_mask,
                 recall_mask, eos_mask):
        self.answers = answers  # [n, T] int64, 0-padded past EOS
        self.lengths = lengths  # [n] true answer length (incl EOS)
        self.payload_mask = payload_mask  # [n, T] original-payload positions
        self.filler_mask = filler_mask  # [n, T] filler positions
        self.recall_mask = recall_mask  # [n, T] restatement positions
        self.eos_mask = eos_mask  # [n, T] the final EOS position


def build_corpus(n: int, k: int, seed: int = 0, m_lo: int = 2,
                 m_hi: int = 8):
    """n samples of the generate-then-restate task with K payload tokens:
    answer = [F b1..bm, P a1..ak, SEP, a1..ak, EOS], m ~ U[m_lo, m_hi].

    Two design points, both measured the hard way (earlier revisions of
    this harness converged to inverted or degenerate predictors):

    * The filler block PRECEDES a CONTIGUOUS payload block. With
      interleaving (P F P F ... ; P P P P) the LM's natural recall
      circuit is successor chaining — find the earlier occurrence of the
      current token, emit what followed it — which makes each filler the
      bridge between consecutive payload tokens, so the CE defends filler
      KV and the predictor learns to keep fillers and drop payload.
    * The filler count is RANDOM per sample. With a fixed count the
      original payload sits at a constant relative offset from the
      restatement and the LM learns a positional copy circuit instead of
      content-based recall; varying m forces induction over the payload
      block and makes the fillers pure droppable noise.

    Payload values are drawn WITHOUT replacement (distinct within a
    sample) so content matching is unambiguous.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    t_max = m_hi + 2 * k + 2
    answers = np.zeros((n, t_max), np.int64)
    lengths = np.zeros((n,), np.int64)
    payload_mask = np.zeros((n, t_max), bool)
    filler_mask = np.zeros((n, t_max), bool)
    recall_mask = np.zeros((n, t_max), bool)
    eos_mask = np.zeros((n, t_max), bool)
    for i in range(n):
        m = int(rng.integers(m_lo, m_hi + 1))
        pay = rng.permutation(N_PAYLOAD)[:k] + PAY0
        fil = rng.integers(0, N_FILLER, size=m) + FIL0
        row = np.concatenate([fil, pay, [SEP], pay, [EOS]])
        answers[i, : len(row)] = row
        lengths[i] = len(row)
        filler_mask[i, :m] = True
        payload_mask[i, m : m + k] = True
        recall_mask[i, m + k + 1 : m + 2 * k + 1] = True
        eos_mask[i, m + 2 * k + 1] = True
    return Corpus(answers, lengths, payload_mask, filler_mask, recall_mask,
                  eos_mask)


def make_cfg(hidden: int, layers: int, sparse_layer: int,
             use_output_text_predictor: bool = True,
             keep_rate: float = 0.5, mask_loss_weight: float = 100.0):
    from dynamic_llava_tpu.config import (
        ClipVisionConfig,
        LlamaConfig,
        LlavaConfig,
        SparseConfig,
    )

    return LlavaConfig(
        text=LlamaConfig(
            vocab_size=VOCAB_SIZE, hidden_size=hidden,
            intermediate_size=hidden * 2, num_hidden_layers=layers,
            num_attention_heads=4, num_key_value_heads=4,
        ),
        # tiny tower: initialized but never run (text-only task)
        vision=ClipVisionConfig(
            hidden_size=16, intermediate_size=32, num_hidden_layers=1,
            num_attention_heads=2, image_size=28, patch_size=14,
        ),
        sparse=SparseConfig(
            d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
            use_vision_predictor=False,
            use_text_predictor=False,
            use_output_text_predictor=use_output_text_predictor,
            output_text_keep_rate=keep_rate,
            # answers here are ~3k+2 tokens; the reference exempts answers
            # shorter than 50 — lower the threshold so T2 applies
            output_text_len_for_training=4,
            use_instruct_predictor=False,
            sparse_layer=sparse_layer,
            mask_loss_weight=mask_loss_weight,
        ),
    )


def train_lm(cfg, k: int, steps: int, batch_size: int = 64, seed: int = 0,
             params=None, log_every: int = 0, lr: float = 3e-3,
             predictor_lr: float = 3e-3):
    """Train through the real train step (T2 Gumbel policy + mask-ratio
    loss when the output-text predictor is on). ``params`` continues from
    a checkpoint (stage 2 finetunes stage 1's LM).

    Every step sees a FRESH random batch (infinite data): with a fixed
    train set this scale memorizes it, and under memorization EVERY
    token's KV predicts the sample's continuation — the filler tokens
    stop being information-free and the keep-everything policy becomes
    CE-optimal (measured; the first fixed-corpus run converged there)."""
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
    corpus = build_corpus(steps * batch_size, k, seed=seed + 12345)
    prompt = np.asarray(PROMPT, np.int64)
    pad_to = len(PROMPT) + corpus.answers.shape[1]

    def make_plan(lo, hi):
        ids, labs = [], []
        for j in range(lo, hi):
            row = np.concatenate(
                [prompt, corpus.answers[j, : corpus.lengths[j]]])
            lab = row.copy()
            lab[: len(prompt)] = -100
            ids.append(row)
            labs.append(lab)
        # pad_to keeps every step's shapes identical -> one compiled step
        return plan_batch(ids, cfg.num_image_tokens, labels_list=labs,
                          pad_to=pad_to)

    opt = make_optimizer(base_lr=lr, predictor_lr=predictor_lr)
    step = make_train_step(cfg, opt, remat=False, labels=label_params(params))
    opt_state = opt.init(params)
    # production tau anneal (train/trainer.py): exponential 1.0 -> 0.1 —
    # a saturated hard-ST mask has ~zero gradient; the early soft phase is
    # what lets the mask-ratio loss steer the predictor at all
    tau_fn = gumbel_tau_schedule(1.0, 0.1, max(steps, 1))
    loss = None
    for i in range(steps):
        batch = batch_from_plan(
            make_plan(i * batch_size, (i + 1) * batch_size), None)
        params, opt_state, m = step(
            params, opt_state, batch, jax.random.key(100 + i),
            jnp.float32(tau_fn(i))
        )
        if log_every and (i + 1) % log_every == 0:
            extra = ""
            if "output_text_mask_loss" in m:
                extra = (" mask_loss "
                         f"{float(m['output_text_mask_loss']):.4f}")
            print(f"# step {i + 1}: lm_loss {float(m['lm_loss']):.4f} "
                  f"loss {float(m['loss']):.4f}{extra}", file=sys.stderr)
        loss = float(m["lm_loss"])
    return params, loss


def eval_arm(params, cfg, corpus: "Corpus", keep_override=None):
    """Teacher-forced eval through the real prefill + E3 decode path.

    ``keep_override``: None (predictor or dense per cfg) or a [T-1, B] 0/1
    matrix of per-step keep decisions (the random arm). Samples past their
    answer length are frozen via ``decode_step(active=)`` — the real
    ragged-batch decode mechanism. Returns recall PPL (incl. the final
    EOS), greedy recall accuracy, and KV survival rates by category.
    """
    import math

    import numpy as np

    import jax
    import jax.numpy as jnp

    from dynamic_llava_tpu.models import dynamic
    from dynamic_llava_tpu.multimodal.fusion import plan_batch

    answers = corpus.answers
    b, t = answers.shape
    plan = plan_batch([np.asarray(PROMPT, np.int64)] * b,
                      cfg.num_image_tokens)
    cache = dynamic.make_gen_cache(
        cfg, b, plan.seq_len, t + 2, jnp.float32,
        # unbounded post tier: the ablation compares keep DECISIONS, so the
        # capacity force-drop must not differ between arms
        bound_output_budget=False, all_have_image=False,
    )
    prefill = jax.jit(dynamic.prefill, static_argnums=(1,))
    decode = jax.jit(
        lambda p, c, tok, st, ac: dynamic.decode_step(p, c, tok, st,
                                                      active=ac),
        static_argnums=(1,),
    )
    decode_ov = jax.jit(
        lambda p, c, tok, st, ac, ko: dynamic.decode_step(
            p, c, tok, st, active=ac, output_text_keep_override=ko
        ),
        static_argnums=(1,),
    )
    state, _ = prefill(
        params, cfg,
        jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
        jnp.asarray(plan.spans.image_start),
        jnp.asarray(plan.spans.last_instruct_start),
        jnp.asarray(plan.spans.last_instruct_end),
        jnp.asarray(plan.spans.has_image),
        None, cache,
    )
    ans = jnp.asarray(answers, jnp.int32)
    logits = [np.asarray(state.last_logits, np.float32)]
    post_has_budget = state.cache.post.num_layers > 0
    lengths = [np.asarray(state.cache.post.length[0] if post_has_budget
                          else state.cache.pre.length[0])]
    for step_i in range(t - 1):  # each sample's final EOS is never fed
        active = jnp.asarray(step_i < corpus.lengths - 1)
        if keep_override is not None:
            state = decode_ov(params, cfg, ans[:, step_i], state, active,
                              jnp.asarray(keep_override[step_i], jnp.int32))
        else:
            state = decode(params, cfg, ans[:, step_i], state, active)
        logits.append(np.asarray(state.last_logits, np.float32))
        lengths.append(np.asarray(state.cache.post.length[0]
                                  if post_has_budget
                                  else state.cache.pre.length[0]))
    logits = np.stack(logits)  # [T, B, V]: logits[j] predicts answers[:, j]
    keeps = np.diff(np.stack(lengths), axis=0).T  # [B, T-1] 0/1 persists

    def logp(lg):
        lg = lg - lg.max(axis=-1, keepdims=True)
        return lg - np.log(np.exp(lg).sum(axis=-1, keepdims=True))

    lp = np.transpose(logp(logits), (1, 0, 2))  # [B, T, V]
    nll_all = -np.take_along_axis(lp, answers[..., None], axis=-1)[..., 0]
    rec_and_eos = corpus.recall_mask | corpus.eos_mask
    ppl = math.exp(float(nll_all[rec_and_eos].mean()))
    greedy = np.transpose(logits, (1, 0, 2)).argmax(axis=-1)  # [B, T]
    acc = float(
        (greedy[corpus.recall_mask] == answers[corpus.recall_mask]).mean())

    # every step actually fed (active) gets a keep decision
    fed = np.arange(t - 1)[None, :] < (corpus.lengths - 1)[:, None]
    row = {
        "recall_ppl": round(ppl, 4),
        "recall_acc": round(acc, 4),
        "payload_kv_kept": round(
            float(keeps[corpus.payload_mask[:, : t - 1]].mean()), 4),
        "filler_kv_kept": round(
            float(keeps[corpus.filler_mask[:, : t - 1]].mean()), 4),
        "answer_keep_rate": round(float(keeps[fed].mean()), 4),
    }
    return row


def run_all(steps: int, batch: int, holdout: int, hidden: int, layers: int,
            k: int = 4, sparse_layer: int = 0, seed: int = 0,
            dense_steps: Optional[int] = None, log_every: int = 0,
            keep_rate: float = 0.5, mask_loss_weight: float = 100.0,
            predictor_lr: float = 3e-3):
    import numpy as np

    import jax

    from dynamic_llava_tpu.models.predictors import init_predictors

    # held-out eval corpus: disjoint seed stream from the training data
    ho = build_corpus(holdout, k, seed=seed)

    cfg = make_cfg(hidden, layers, sparse_layer, keep_rate=keep_rate,
                   mask_loss_weight=mask_loss_weight)
    dense_cfg = make_cfg(hidden, layers, sparse_layer,
                         use_output_text_predictor=False)

    dense_steps = steps if dense_steps is None else dense_steps
    params, loss1 = train_lm(dense_cfg, k, dense_steps, batch_size=batch,
                             seed=seed, log_every=log_every)
    print(f"# stage 1 (dense): {dense_steps} steps, lm_loss {loss1:.4f}",
          file=sys.stderr)
    params = dict(params)
    # prune-in init (see init_text_predictor): start at keep-everything so
    # the early Gumbel phase cannot CE-panic the shared output bias into
    # irrecoverable keep-all saturation
    params["predictors"] = init_predictors(
        jax.random.key(seed + 1), cfg.text, cfg.sparse, jax.numpy.float32,
        text_keep_bias=3.0,
    )
    params, loss2 = train_lm(cfg, k, steps, batch_size=batch, seed=seed + 1,
                             params=params, log_every=log_every,
                             predictor_lr=predictor_lr)
    print(f"# stage 2 (sparse finetune): {steps} steps of fresh batch-"
          f"{batch} data ({holdout} held out), final lm_loss {loss2:.4f}",
          file=sys.stderr)

    rows = {}
    rows["dense"] = eval_arm(params, dense_cfg, ho)
    rows["learned"] = eval_arm(params, cfg, ho)

    # random arm at the learned arm's MEASURED keep rate (matched budget)
    match = rows["learned"]["answer_keep_rate"]
    rng = np.random.default_rng(seed + 7)
    t = ho.answers.shape[1]
    override = (rng.uniform(size=(t - 1, holdout)) < match).astype(np.int32)
    rows[f"random@{match:.2f}"] = eval_arm(params, cfg, ho,
                                           keep_override=override)

    # untrained control: fresh init WITHOUT the keep bias (the biased init
    # thresholds to keep-all, which is just the dense arm) — content-based
    # but meaningless scores through the identical E3 path
    up = dict(params)
    up["predictors"] = init_predictors(
        jax.random.key(seed + 99), cfg.text, cfg.sparse, jax.numpy.float32
    )
    rows["untrained"] = eval_arm(up, cfg, ho)

    for name, row in rows.items():
        print(json.dumps({"arm": name, **row}), flush=True)
    rand_key = f"random@{match:.2f}"
    gaps = {
        "learned_minus_random_acc": round(
            rows["learned"]["recall_acc"] - rows[rand_key]["recall_acc"], 4),
        "dense_minus_learned_acc": round(
            rows["dense"]["recall_acc"] - rows["learned"]["recall_acc"], 4),
    }
    print(json.dumps({"summary": rows, "gaps": gaps}))
    return rows, gaps


def main():
    # defaults = the headline table's config (docs/BENCHMARKS.md): learned
    # keep-0.64 matches dense exactly (recall acc 1.0 / ppl 1.002) while
    # random@0.64 collapses to acc 0.63 / ppl 11.4
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=64,
                    help="fresh samples per train step (infinite data)")
    ap.add_argument("--holdout", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=96)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--k", type=int, default=2,
                    help="payload tokens per sample (k=4 stalls stage-1 "
                         "recall learning at this scale — measured)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dense-steps", dest="dense_steps", type=int,
                    default=400)
    ap.add_argument("--log-every", type=int, default=0)
    ap.add_argument("--keep-rate", dest="keep_rate", type=float,
                    default=0.5,
                    help="mask-ratio target; the task's natural rate is "
                         "(k+2)/(3k+2) payload+SEP+EOS of the answer")
    ap.add_argument("--mask-loss-weight", dest="mask_loss_weight",
                    type=float, default=100.0)
    ap.add_argument("--predictor-lr", dest="predictor_lr", type=float,
                    default=6e-3)
    ap.add_argument("--sparse-layer", dest="sparse_layer", type=int,
                    default=0,
                    help="pruning boundary; 0 = every layer sees only kept "
                         "KV (the clean ablation); >=1 leaves a pre tier "
                         "that persists everything — at toy depth the LM "
                         "may solve recall entirely in the pre tier (the "
                         "same leak run/sparse_quality.py documents)")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    run_all(args.steps, args.batch, args.holdout, args.hidden, args.layers,
            k=args.k, sparse_layer=args.sparse_layer, seed=args.seed,
            dense_steps=args.dense_steps, log_every=args.log_every,
            keep_rate=args.keep_rate,
            mask_loss_weight=args.mask_loss_weight,
            predictor_lr=args.predictor_lr)


if __name__ == "__main__":
    main()
