"""Entry-point smoke tests (the reference ships entries with no tests
at all, SURVEY §4 — these run each CLI top-to-bottom on tiny inputs)."""

import csv
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestEvaluateEntry:
    def test_analytic_gt_csv(self, tmp_path):
        """evaluate.py with --gt-sdf: a near-perfect sphere mesh scores
        a tiny chamfer; the CSV lands in the experiment dir."""
        from isopoints_tpu.data.synthetic import sphere_sdf
        from isopoints_tpu.utils.io import save_ply
        from isopoints_tpu.utils.meshing import extract_mesh

        verts, faces = extract_mesh(sphere_sdf(0.5), resolution=48)
        save_ply(str(tmp_path / "final.ply"), verts, faces=faces)

        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "evaluate.py"),
             str(tmp_path), "--gt-sdf", "sphere", "--n-samples", "2000"],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        out_csv = tmp_path / "eval.csv"
        assert out_csv.exists()
        rows = list(csv.DictReader(open(out_csv)))
        assert len(rows) == 1
        # a 48³ marching-tet sphere vs 2k GT samples: chamfer_p is a
        # squared distance — grid-resolution scale
        assert float(rows[0]["chamfer_p"]) < 5e-3, rows[0]
