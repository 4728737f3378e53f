"""LLaVA-bench(-in-the-wild) GPT review (caption context, llava_bench_ rules).

Entry point matching /root/reference/llava/eval/eval_gpt_review_bench.py;
all logic lives in eval_gpt_review.run_review(variant="bench").
"""

from .eval_gpt_review import main as _main


def main(argv=None):
    _main(argv, variant="bench")


if __name__ == "__main__":
    main()
