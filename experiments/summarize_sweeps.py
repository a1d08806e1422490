#!/usr/bin/env python
"""Summarize encoder-sweep artifacts into the BASELINE.md comparison table.

Reads experiments/results/encoder_sweep_*.json / bert_sweep_*.json and
prints, per encoder: final metric, tail mean/min (last third of epochs),
divergence, and compression ratio — the synthetic-data counterpart of the
reference's Table I.
"""

import json
import os
import sys

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")


def tail_stats(history, key):
    vals = [h[key] for h in history if key in h]
    if not vals:
        return None, None
    tail = vals[-(max(len(vals) // 3, 1)):]
    return sum(tail) / len(tail), min(tail)


def main():
    files = sys.argv[1:] or sorted(
        os.path.join(RESULTS, f)
        for f in os.listdir(RESULTS)
        if f.startswith(("encoder_sweep", "bert_sweep")) and f.endswith(".json")
    )
    for path in files:
        with open(path) as f:
            r = json.load(f)
        meta = r.get("_meta", {})
        extra = ""
        if meta.get("fp32_warmup_epochs"):
            extra = (f", warmup={meta['fp32_warmup_epochs']}ep"
                     f"->corr {meta.get('warmup_final_correlation')}")
        if meta.get("model_dims"):
            extra += f", dims={meta['model_dims']}"
        print(f"\n== {os.path.basename(path)} "
              f"(model={meta.get('model')}, epochs={meta.get('epochs')}, "
              f"backend={meta.get('backend')}{extra})")
        is_bert = "bert" in os.path.basename(path)
        key = "val_corr" if is_bert else "val_accuracy"
        print(f"{'encoder':20s} {'final':>8s} {'tail_mean':>10s} "
              f"{'tail_min':>9s} {'ratio':>6s} {'diverged':>9s}")
        for enc, v in r.items():
            if enc.startswith("_"):
                continue
            final = v.get("mean_correlation" if is_bert else "val_accuracy")
            tm, tmin = tail_stats(v.get("history", []), key)
            print(f"{enc:20s} {final!s:>8s} "
                  f"{'-' if tm is None else format(tm, '.4f'):>10s} "
                  f"{'-' if tmin is None else format(tmin, '.4f'):>9s} "
                  f"{v.get('compression_ratio'):>6} "
                  f"{v.get('nan_terminated')!s:>9s}")


if __name__ == "__main__":
    main()
