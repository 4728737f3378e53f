#!/bin/bash
# Q-Bench LLVisionQA (reference /root/reference/scripts/v1_5/eval/qbench.sh).
# Usage: eval_for_qbench.sh [dev|test]
SPLIT=${1:-dev}
if [ "$SPLIT" != "dev" ] && [ "$SPLIT" != "test" ]; then
    echo "Unknown split, please choose between 'dev' and 'test'."
    exit 1
fi
CKPT=${CKPT:-./checkpoints/dynamic-llava-v1.5-7b}
python -m dynamic_llava_tpu.eval.model_vqa_qbench \
    --model-path "$CKPT" \
    --image-folder ./playground/data/eval/qbench/images_llvisionqa/ \
    --questions-file ./playground/data/eval/qbench/llvisionqa_$SPLIT.json \
    --answers-file ./playground/data/eval/qbench/llvisionqa_${SPLIT}_answers.jsonl \
    --conv-mode llava_v1 --lang en
