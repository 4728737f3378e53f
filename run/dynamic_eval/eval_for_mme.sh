#!/bin/bash
# MME: generate answers, then self-contained conversion + scoring
# (reference /root/reference/scripts/v1_5/eval/mme.sh; the conversion and
# calculation steps ship with the benchmark there — here eval_mme does both).
CKPT=${CKPT:-./checkpoints/dynamic-llava-v1.5-7b}
python -m dynamic_llava_tpu.eval.model_vqa_loader \
    --model-path "$CKPT" \
    --question-file ./playground/data/eval/MME/llava_mme.jsonl \
    --image-folder ./playground/data/eval/MME/MME_Benchmark_release_version \
    --answers-file ./playground/data/eval/MME/answers/dynamic-llava.jsonl \
    --temperature 0 --conv-mode vicuna_v1
python -m dynamic_llava_tpu.eval.eval_mme \
    --question-file ./playground/data/eval/MME/llava_mme.jsonl \
    --result-file ./playground/data/eval/MME/answers/dynamic-llava.jsonl \
    --mme-dir ./playground/data/eval/MME/MME_Benchmark_release_version \
    --output-file ./playground/data/eval/MME/answers/dynamic-llava-scores.json
