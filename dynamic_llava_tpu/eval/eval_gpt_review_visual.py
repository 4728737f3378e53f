"""Visual-QA GPT review (captions + labelled boxes as judge context).

Entry point matching /root/reference/llava/eval/eval_gpt_review_visual.py;
all logic lives in eval_gpt_review.run_review(variant="visual").
"""

from .eval_gpt_review import main as _main


def main(argv=None):
    _main(argv, variant="visual")


if __name__ == "__main__":
    main()
