"""Aggregate GPT review scores per category
(reference /root/reference/llava/eval/summarize_gpt_review.py)."""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict

import numpy as np


def summarize(review_files, ignore=None, select=None):
    for review_file in sorted(review_files):
        config = os.path.basename(review_file).replace("gpt4_text_", "").replace(".jsonl", "")
        if select is not None and any(x not in config for x in select):
            continue
        scores = defaultdict(list)
        print(config)
        with open(review_file) as f:
            for review_str in f:
                review = json.loads(review_str)
                if ignore is not None and review.get("question_id") in ignore:
                    continue
                if "category" in review:
                    scores[review["category"]].append(review["tuple"])
                    scores["all"].append(review["tuple"])
                else:
                    ctg = "_".join(review.get("tuple_category", ["all"]))
                    scores[ctg].append(review["tuple"])
                    scores["all"].append(review["tuple"])
        for k, v in sorted(scores.items()):
            stats = np.asarray(v).mean(0).tolist()
            stats = [round(t, 3) for t in stats]
            print(
                k,
                round(stats[1] / stats[0] * 100, 1) if stats[0] else 0.0,
                round(stats[0] * 10, 1),
                round(stats[1] * 10, 1),
            )
        print("=================================")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--dir", default=None)
    parser.add_argument("-v", "--version", default=None)
    parser.add_argument("-s", "--select", nargs="*", default=None)
    parser.add_argument("-f", "--files", nargs="*", default=[])
    parser.add_argument("-i", "--ignore", nargs="*", default=None)
    args = parser.parse_args(argv)

    ignore = [int(x) for x in args.ignore] if args.ignore is not None else None
    if args.dir is not None:
        review_files = [
            os.path.join(args.dir, f)
            for f in os.listdir(args.dir)
            if f.endswith(".jsonl") and (args.version is None or args.version in f)
        ]
    else:
        review_files = args.files
    summarize(review_files, ignore=ignore, select=args.select)


if __name__ == "__main__":
    main()
