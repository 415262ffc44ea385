"""Batch sweep runner for the 2D positional-encoding study — the
cross-platform equivalent of the reference's PowerShell autorun
(2d_pos_encoding/autorun.py): runs pos2d over a grid of L / layer_num /
regularization values and appends each result row to metrics.csv.

Usage: python -m swnerf_tpu.experiments.autorun -pd image.png \
           [--Ls 0 5 10 20] [--layer_nums 4 10] [--regs 0 0.01] [--epochs 50]
"""

from __future__ import annotations

import argparse
import itertools

from swnerf_tpu.experiments.pos2d import main as pos2d_main


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--picture_dir", "-pd", required=True)
    ap.add_argument("--Ls", type=int, nargs="+", default=[0, 5, 10, 20])
    ap.add_argument("--layer_nums", type=int, nargs="+", default=[10])
    ap.add_argument("--regs", type=float, nargs="+", default=[0.0])
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--output_dir", "-od", default="2d_pos_encoding/result")
    ap.add_argument("--checkpoint_save", "-cs", default="2d_pos_encoding/checkpoint")
    args = ap.parse_args(argv)

    for L, ln, reg in itertools.product(args.Ls, args.layer_nums, args.regs):
        print(f"=== sweep: L={L} layer_num={ln} reg={reg} ===")
        pos2d_main(
            [
                "-pd", args.picture_dir,
                "--L", str(L),
                "--layer_num", str(ln),
                "--epochs", str(args.epochs),
                "--regularization", str(reg),
                "-od", args.output_dir,
                "-cs", args.checkpoint_save,
            ]
        )


if __name__ == "__main__":
    main()
