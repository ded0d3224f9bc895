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

# entry subprocesses inherit the parent env, and in a TPU-attached
# environment would compile on (and contend for) the real chip — CI
# must stay CPU-only and deterministic like the in-process tests.
# JAX_PLATFORMS alone is NOT enough: the axon sitecustomize overrides
# it before entry code runs. ISOPOINTS_PLATFORM is honored at package
# import (isopoints_tpu/__init__.py), which every entry hits before
# first device use.
_CPU_ENV = {**os.environ, "JAX_PLATFORMS": "cpu",
            "ISOPOINTS_PLATFORM": "cpu"}


def _cpu_run(cmd, **kw):
    kw.setdefault("env", _CPU_ENV)
    return subprocess.run(cmd, **kw)


class TestEvaluateEntry:
    def test_analytic_gt_csv(self, tmp_path):
        """evaluate.py with --gt-sdf: a near-perfect sphere mesh scores
        a tiny chamfer; the CSV lands in the experiment dir."""
        from isopoints_tpu.data.synthetic import sphere_sdf
        from isopoints_tpu.utils.io import save_ply
        from isopoints_tpu.utils.meshing import extract_mesh

        verts, faces = extract_mesh(sphere_sdf(0.5), resolution=48)
        save_ply(str(tmp_path / "final.ply"), verts, faces=faces)

        r = _cpu_run(
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


class TestScriptEntries:
    def test_evaluate_pointclouds(self, tmp_path):
        from isopoints_tpu.utils.io import save_ply

        rng = np.random.RandomState(0)
        d = rng.normal(size=(4000, 3)).astype(np.float32)
        gt = 0.5 * d / np.linalg.norm(d, axis=-1, keepdims=True)
        pred = gt + rng.normal(scale=1e-3, size=gt.shape).astype(np.float32)
        save_ply(str(tmp_path / "gt.ply"), gt)
        save_ply(str(tmp_path / "pred.ply"), pred)
        r = _cpu_run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "evaluate_pointclouds.py"),
             str(tmp_path / "pred.ply"), str(tmp_path / "gt.ply")],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "chamfer" in (r.stdout + r.stderr).lower()

    @pytest.mark.slow
    def test_create_mvr_data_roundtrip(self, tmp_path):
        """Analytic-SDF dataset generation loads back through
        MVRDataset with working cameras."""
        out = str(tmp_path / "data")
        r = _cpu_run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "create_mvr_data.py"),
             "sphere", out, "--n-views", "3", "--image-size", "32",
             "--n-gt-points", "500"],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        from isopoints_tpu.data.dataset import MVRDataset

        ds = MVRDataset(out)
        assert len(ds) == 3
        item = ds[0]
        assert item["img.rgb"].shape == (32, 32, 3)
        # the sphere silhouette covers a plausible fraction
        cov = float(item["img.mask"].mean())
        assert 0.05 < cov < 0.6

    def test_measure_scaling_json_lines(self):
        r = _cpu_run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "measure_scaling.py"),
             "--cpu-devices", "2", "--rays-per-device", "64",
             "--iters", "2", "--mesh-sizes", "1", "2"],
            capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stderr[-2000:]
        import json
        lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        assert len(lines) == 2
        recs = [json.loads(l) for l in lines]
        assert recs[0]["n_devices"] == 1 and recs[1]["n_devices"] == 2
        assert all(np.isfinite(rec["total_rays_per_s"]) and
                   rec["total_rays_per_s"] > 0 for rec in recs)
        assert all(np.isfinite(rec["weak_scaling_efficiency"]) for rec in recs)
