#!/bin/bash
# MMBench-CN dev split (reference /root/reference/scripts/v1_5/eval/mmbench_cn.sh).
CKPT=${CKPT:-./checkpoints/dynamic-llava-v1.5-7b}
SPLIT=${SPLIT:-mmbench_dev_cn_20231003}
python -m dynamic_llava_tpu.eval.model_vqa_mmbench \
    --model-path "$CKPT" \
    --question-file ./playground/data/eval/mmbench_cn/$SPLIT.tsv \
    --answers-file ./playground/data/eval/mmbench_cn/answers/$SPLIT/dynamic-llava.jsonl \
    --lang cn --single-pred-prompt \
    --temperature 0 --conv-mode vicuna_v1
mkdir -p ./playground/data/eval/mmbench_cn/answers_upload/$SPLIT
python -m dynamic_llava_tpu.eval.convert_mmbench_for_submission \
    --annotation-file ./playground/data/eval/mmbench_cn/$SPLIT.tsv \
    --result-dir ./playground/data/eval/mmbench_cn/answers/$SPLIT \
    --upload-dir ./playground/data/eval/mmbench_cn/answers_upload/$SPLIT \
    --experiment dynamic-llava
