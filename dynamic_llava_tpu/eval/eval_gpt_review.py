"""GPT-judged pairwise review harness (LLaVA-bench / MM-Vet style).

Rebuild of /root/reference/llava/eval/eval_gpt_review_bench.py +
eval_gpt_review_visual.py: builds judge prompts from rule files, collects
"score1 score2" verdicts, and writes review JSONL. The judge backend is
pluggable: the default OpenAI client needs network + OPENAI_API_KEY (the
reference has the same dependency); pass any callable for offline judging.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Callable, Optional

NUM_SECONDS_TO_SLEEP = 0.5


def openai_judge(model: str = "gpt-4-0314", max_tokens: int = 1024) -> Callable:
    import openai

    def get_eval(content: str) -> str:
        while True:
            try:
                response = openai.chat.completions.create(
                    model=model,
                    messages=[
                        {
                            "role": "system",
                            "content": (
                                "You are a helpful and precise assistant "
                                "for checking the quality of the answer."
                            ),
                        },
                        {"role": "user", "content": content},
                    ],
                    temperature=0.2,
                    max_tokens=max_tokens,
                )
                return response.choices[0].message.content
            except Exception as e:
                print(e)
                time.sleep(NUM_SECONDS_TO_SLEEP)

    return get_eval


def parse_score(review: str):
    """First line must be 'x y' — two float scores (reference parse logic)."""
    try:
        score_pair = review.split("\n")[0].replace(",", " ")
        sp = score_pair.split(" ")
        if len(sp) == 2:
            return [float(sp[0]), float(sp[1])]
        print("error", review)
        return [-1, -1]
    except Exception as e:
        print(e)
        print("error", review)
        return [-1, -1]


def run_review(
    question_file: str,
    context_file: str,
    rule_file: str,
    answer_files: list,
    output_file: str,
    judge: Optional[Callable] = None,
    limit: int = 0,
):
    judge = judge or openai_judge()
    f_q = open(os.path.expanduser(question_file))
    f_ans1 = open(os.path.expanduser(answer_files[0]))
    f_ans2 = open(os.path.expanduser(answer_files[1]))
    rule_dict = json.load(open(os.path.expanduser(rule_file)))
    context_list = [json.loads(line) for line in open(os.path.expanduser(context_file))]
    image_to_context = {c["image"]: c for c in context_list}

    os.makedirs(os.path.dirname(os.path.abspath(output_file)) or ".", exist_ok=True)
    review_file = open(output_file, "w")

    handles = zip(f_q, f_ans1, f_ans2)
    for idx, (ques_js, ans1_js, ans2_js) in enumerate(handles):
        if limit and idx >= limit:
            break
        ques = json.loads(ques_js)
        ans1 = json.loads(ans1_js)
        ans2 = json.loads(ans2_js)

        inst = image_to_context[ques["image"]]
        if isinstance(inst.get("caption"), list):
            cap_str = "\n".join(inst["caption"])
        else:
            cap_str = inst.get("caption", "")

        category = "llava_bench_" + json.loads(ques_js).get("category", "conv")
        rule = rule_dict.get(category, rule_dict.get("default", {}))
        prompt = rule.get("prompt", "")
        role = rule.get("role", "Assistant")
        content = (
            f"[Context]\n{cap_str}\n\n"
            f"[Question]\n{ques['text']}\n\n"
            f"[{role} 1]\n{ans1['text']}\n\n[End of {role} 1]\n\n"
            f"[{role} 2]\n{ans2['text']}\n\n[End of {role} 2]\n\n"
            f"[System]\n{prompt}\n\n"
        )
        review = judge(content)
        scores = parse_score(review)
        review_file.write(json.dumps({
            "id": idx + 1,
            "question_id": ques["question_id"],
            "answer1_id": ans1.get("answer_id", ans1["question_id"]),
            "answer2_id": ans2.get("answer_id", ans2["question_id"]),
            "category": category,
            "content": review,
            "tuple": scores,
        }) + "\n")
        review_file.flush()
    review_file.close()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-q", "--question", required=True)
    parser.add_argument("-c", "--context", required=True)
    parser.add_argument("-a", "--answer-list", nargs="+", required=True)
    parser.add_argument("-r", "--rule", required=True)
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("--limit", type=int, default=0)
    args = parser.parse_args(argv)
    run_review(args.question, args.context, args.rule, args.answer_list,
               args.output, limit=args.limit)


if __name__ == "__main__":
    main()
