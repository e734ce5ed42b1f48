#!/usr/bin/env python
"""Summarize a tools/sweep.py JSONL into a per-axis markdown table.

    python tools/sweep_report.py -in sweep_results.jsonl [-seed_key train.seed]

Groups records by the single non-seed override axis that varies in each
record (star-design sweeps: one axis off-default at a time), reports
mean +/- sd over seeds for valid_bleu and val_ppl.
"""

import argparse
import json
from collections import defaultdict

import numpy as np


def main():
    p = argparse.ArgumentParser("sweep report")
    p.add_argument("-in", dest="inp", required=True)
    p.add_argument("-seed_key", default="train.seed")
    args = p.parse_args()

    rows = [json.loads(l) for l in open(args.inp) if l.strip()]
    groups = defaultdict(list)
    for r in rows:
        axis = {k: v for k, v in r["overrides"].items() if k != args.seed_key}
        key = tuple(sorted(axis.items())) or (("(defaults)", ""),)
        groups[key].append(r)

    print("| config | n | valid BLEU | val ppl | sec/run |")
    print("|---|---|---|---|---|")
    for key in sorted(groups):
        rs = groups[key]
        name = " ".join(f"{k}={v}" for k, v in key if k != "(defaults)") or "defaults"
        bleu = [r.get("valid_bleu") for r in rs if r.get("valid_bleu") is not None]
        ppl = [r["val_ppl"] for r in rs]
        bs = (f"{np.mean(bleu):.2f} ± {np.std(bleu):.2f}" if bleu else "—")
        print(f"| {name} | {len(rs)} | {bs} | "
              f"{np.mean(ppl):.2f} ± {np.std(ppl):.2f} | "
              f"{np.mean([r['seconds'] for r in rs]):.0f} |")


if __name__ == "__main__":
    main()
