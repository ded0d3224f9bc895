#!/usr/bin/env python
"""Plot evaluation CSVs (chamfer over checkpoints) to HTML.

Parity: reference scripts/plot_evaluations.py (CSV → plotly).

Usage: python scripts/plot_evaluations.py out/run/eval.csv
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("csv_files", nargs="+")
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    from isopoints_tpu.misc.visualize import _go, figures_to_html

    go = _go()
    figs = []
    for path in args.csv_files:
        with open(path) as f:
            rows = list(csv.DictReader(f))
        if not rows:
            continue
        metrics = [k for k in rows[0] if k != "mesh"]
        fig = go.Figure(data=[
            go.Scatter(x=[r["mesh"] for r in rows],
                       y=[float(r[m]) for r in rows],
                       name=m, mode="lines+markers")
            for m in metrics])
        fig.update_layout(title=os.path.basename(path))
        figs.append(fig)
    out = args.out or os.path.splitext(args.csv_files[0])[0] + ".html"
    figures_to_html(figs, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
