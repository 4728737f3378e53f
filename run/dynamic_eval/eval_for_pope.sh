#!/bin/bash
CKPT=${CKPT:-./checkpoints/dynamic-llava-v1.5-7b}
python -m dynamic_llava_tpu.eval.model_vqa_loader \
    --model-path "$CKPT" \
    --question-file ./playground/data/eval/pope/llava_pope_test.jsonl \
    --image-folder ./playground/data/eval/pope/val2014 \
    --answers-file ./playground/data/eval/pope/answers/dynamic-llava.jsonl \
    --temperature 0 --conv-mode vicuna_v1
python -m dynamic_llava_tpu.eval.eval_pope \
    --annotation-dir ./playground/data/eval/pope/coco \
    --question-file ./playground/data/eval/pope/llava_pope_test.jsonl \
    --result-file ./playground/data/eval/pope/answers/dynamic-llava.jsonl
