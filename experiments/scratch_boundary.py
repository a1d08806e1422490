#!/usr/bin/env python
"""Map the from-scratch full-coverage boundary (VERDICT r4 missing #3).

BASELINE.md round-4 scope note: the stable momentum codecs
(--momentum_rowwise --momentum_log_nu) fix full-coverage SmaQ FINE-TUNING,
but from-scratch Adam training still stalls on the initial plateau
(corr 0.036 after 80 epochs, bert_sweep_stsb_scratch_stablemom.json, where
fp32 escapes at epoch ~38 and reaches 0.73).

This sweep measures WHERE the boundary sits: how many epochs of fp32 warmup
rescue a full-coverage stable-codec run.  For each warmup length W the total
budget stays 100 epochs (W fp32 + (100-W) under the encoder), lr 2e-4
(the scratch regime of bert_sweep_stsb_refregime.json), bert-tiny L2 H64.

  python experiments/scratch_boundary.py \
      --out experiments/results/bert_scratch_boundary.json
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warmups", nargs="+", type=int,
                    default=[0, 5, 20, 40, 60])
    ap.add_argument("--total_epochs", type=int, default=100)
    ap.add_argument("--learning_rate", default="2e-4")
    ap.add_argument("--encoders", nargs="+",
                    default=["fp32", "smart@rowmom,lognu"])
    ap.add_argument("--out",
                    default="experiments/results/bert_scratch_boundary.json")
    args = ap.parse_args()

    merged = {
        "_meta": {
            "design": "total budget fixed at --total_epochs; W fp32 warmup "
                      "epochs then (total - W) under each encoder; scratch "
                      "regime lr from bert_sweep_stsb_refregime.json "
                      "(fp32 escapes the plateau at epoch ~38)",
            "total_epochs": args.total_epochs,
            "learning_rate": args.learning_rate,
        }
    }
    for w in args.warmups:
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
            tmp = f.name
        cmd = [
            sys.executable, os.path.join(HERE, "bert_sweep.py"),
            "--fp32_warmup_epochs", str(w),
            "--epochs", str(args.total_epochs - w),
            "--learning_rate", args.learning_rate,
            "--encoders", *args.encoders,
            "--out", tmp,
        ]
        print(f"[boundary] warmup={w}: {' '.join(cmd)}", flush=True)
        subprocess.run(cmd, check=True)
        with open(tmp) as f:
            res = json.load(f)
        os.unlink(tmp)
        entry = {"warmup_epochs": w}
        if "warmup_final_correlation" in res.get("_meta", {}):
            entry["warmup_final_corr"] = res["_meta"][
                "warmup_final_correlation"
            ]
        for enc, r in res.items():
            if enc.startswith("_"):
                continue
            entry[enc] = {
                "mean_correlation": r["mean_correlation"],
                "tail_mean_correlation": r["tail_mean_correlation"],
                "compression_ratio": r["compression_ratio"],
                "nan_terminated": r["nan_terminated"],
            }
        merged[f"warmup{w}"] = entry
        with open(args.out, "w") as f:
            json.dump(merged, f, indent=2)
        print(f"[boundary] warmup={w} done: "
              f"{json.dumps({k: v for k, v in entry.items() if k != 'warmup_epochs'})}",
              flush=True)

    print("\nwarmup  fp32_corr  smart_full_corr")
    for w in args.warmups:
        e = merged[f"warmup{w}"]
        fp = e.get("fp32", {}).get("mean_correlation")
        sm = e.get("smart@rowmom,lognu", {}).get("mean_correlation")
        print(f"{w:6d} {fp!s:>10} {sm!s:>16}")


if __name__ == "__main__":
    main()
