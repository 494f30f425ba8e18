#!/usr/bin/env python
"""Timing-experiment orchestration (parity: run_time_experiment.sh).

Sweeps SuperMinHash sizes / tile sizes over the time_smh CLI and writes
experimento_smh_comparativo.csv with rows `impl,param,mh_size,rep,criterio,tiempo`
(same columns as run_time_experiment.sh:15-16; `impl` is `tpu` here).
"""

import argparse
import csv
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-l", dest="list_file", required=True)
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--mh-sizes", type=int, nargs="+", default=[512])
    ap.add_argument("--blocks", type=int, nargs="+", default=[512])
    ap.add_argument("-o", dest="out", default="experimento_smh_comparativo.csv")
    args = ap.parse_args()

    from cuda_selection_criteria_tpu.cli import time_smh

    rows = []
    for block in args.blocks:
        for m in args.mh_sizes:
            for rep in range(1, args.reps + 1):
                buf = io.StringIO()
                with redirect_stdout(buf):
                    time_smh.main([
                        "-l", args.list_file, "-h", str(args.threshold),
                        "-m", str(m), "--block", str(block),
                    ])
                for line in buf.getvalue().splitlines():
                    parts = line.split(";")
                    if len(parts) >= 4:
                        rows.append(
                            ["tpu", block, m, rep, parts[1], parts[3]]
                        )
    with open(args.out, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["impl", "block", "mh_size", "rep", "criterio", "tiempo"])
        w.writerows(rows)
    print(f"Listo, resultados en {args.out}")


if __name__ == "__main__":
    main()
