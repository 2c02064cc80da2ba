"""Parity harness: compare zero-shot score TSVs against reference outputs.

Usage:
    python tools/parity_check.py ours.tsv theirs.tsv [--col zeroShotScore]
                                 [--rtol 1e-3] [--atol 1e-4]

Both files are scoring TSVs (cli.zero_shot_score output / the torch
reference's output). Rows are matched on (chr, pos, ref, alt) when present,
else by order. Prints max/mean absolute difference, correlation, and
pass/fail under the tolerance; exit code 1 on failure.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import pandas as pd

    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("theirs")
    ap.add_argument("--col", default="zeroShotScore")
    ap.add_argument("--rtol", type=float, default=1e-3)
    ap.add_argument("--atol", type=float, default=1e-4)
    args = ap.parse_args()

    a = pd.read_csv(args.ours, sep="\t")
    b = pd.read_csv(args.theirs, sep="\t")
    keys = [k for k in ("chr", "pos", "ref", "alt") if
            k in a.columns and k in b.columns]
    if keys:
        m = a.merge(b, on=keys, suffixes=("_ours", "_ref"))
        xa = m[args.col + "_ours"].to_numpy(float)
        xb = m[args.col + "_ref"].to_numpy(float)
        print(f"matched {len(m)} rows on {keys}")
    else:
        n = min(len(a), len(b))
        xa = a[args.col].to_numpy(float)[:n]
        xb = b[args.col].to_numpy(float)[:n]
        print(f"matched {n} rows by order")

    diff = np.abs(xa - xb)
    tol = args.atol + args.rtol * np.abs(xb)
    bad = diff > tol
    corr = float(np.corrcoef(xa, xb)[0, 1]) if len(xa) > 1 else float("nan")
    print(f"max |diff| = {diff.max():.6g}  mean = {diff.mean():.6g}  "
          f"pearson r = {corr:.6f}")
    print(f"{bad.sum()} / {len(xa)} rows outside rtol={args.rtol} "
          f"atol={args.atol}")
    if bad.any():
        worst = np.argsort(-diff)[:5]
        for i in worst:
            print(f"  row {i}: ours={xa[i]:.6g} ref={xb[i]:.6g}")
        sys.exit(1)
    print("PARITY OK")


if __name__ == "__main__":
    main()
