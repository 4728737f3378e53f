#!/bin/bash
# Chunked ScienceQA eval: N parallel generator chunks + merge + scorer
# (reference /root/reference/scripts/sqa_eval_batch.sh + sqa_eval_gather.sh
# collapsed into one driver; chunks map to hosts/processes on TPU).
CKPT=${CKPT:-./checkpoints/dynamic-llava-v1.5-7b}
SQA=${SQA:-./playground/data/eval/scienceqa}
CHUNKS=${CHUNKS:-1}
ANSDIR=./playground/data/eval/scienceqa/answers

for IDX in $(seq 0 $((CHUNKS-1))); do
    python -m dynamic_llava_tpu.eval.model_vqa_science \
        --model-path "$CKPT" \
        --question-file "$SQA/llava_test_CQM-A.json" \
        --image-folder "$SQA/images/test" \
        --answers-file "$ANSDIR/chunk${IDX}.jsonl" \
        --num-chunks $CHUNKS --chunk-idx $IDX \
        --single-pred-prompt --temperature 0 --conv-mode vicuna_v1 &
done
wait

output_file=$ANSDIR/merge.jsonl
> "$output_file"
for IDX in $(seq 0 $((CHUNKS-1))); do
    cat "$ANSDIR/chunk${IDX}.jsonl" >> "$output_file"
done

python -m dynamic_llava_tpu.eval.eval_science_qa \
    --base-dir "$SQA" \
    --result-file "$output_file" \
    --output-file "$ANSDIR/output.json" \
    --output-result "$ANSDIR/result.json"
