"""Candidate-selection kernel equivalence (rendering/pallas_select.py).

The kernel must reproduce the XLA strip+tile top_k selection
(`rasterizer._tile_candidates`) exactly as a SET per tile (including
capacity tie-breaks by index and overflow counts), and the full Pallas
rasterization path must emit bit-identical fragment maps with either
coarse stage (order-insensitivity of the fine kernel).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isopoints_tpu.rendering.rasterizer import (
    RasterizationSettings,
    _pixel_ndc,
    _rasterize_one,
    _tile_candidates,
)
from isopoints_tpu.rendering.pallas_select import select_candidates_pallas


def _random_splats(rng, P, z_ties=False):
    px = rng.uniform(-1.1, 1.1, P).astype(np.float32)
    py = rng.uniform(-1.1, 1.1, P).astype(np.float32)
    z = rng.uniform(0.5, 3.0, P).astype(np.float32)
    if z_ties:
        # force heavy depth ties to exercise the tie-break path
        z = np.round(z * 8.0) / 8.0
    rx = rng.uniform(0.01, 0.25, P).astype(np.float32)
    ry = rng.uniform(0.01, 0.25, P).astype(np.float32)
    valid = rng.uniform(size=P) > 0.1
    return px, py, z, rx, ry, valid


def _xla_selection(px, py, z, rx, ry, valid, S, T, strip_cap, M):
    nt = S // T
    xs = _pixel_ndc(jnp.arange(S), S)
    half = float(T - 1) / S
    cx = 0.5 * (xs[::T] + xs[T - 1::T])

    def row(ti):
        rows = ti * T + jnp.arange(T)
        ys = _pixel_ndc(rows, S)
        cy = 0.5 * (ys[0] + ys[-1])
        return _tile_candidates(px, py, z, rx, ry, valid, cy, cx, half,
                                M, strip_cap=strip_cap)

    ci, ok, ovf = jax.lax.map(row, jnp.arange(nt))
    return (np.asarray(ci.reshape(nt * nt, M)),
            np.asarray(ok.reshape(nt * nt, M)), int(ovf.sum()))


def _assert_same_sets(ci_a, ok_a, ci_b, ok_b):
    assert ci_a.shape == ci_b.shape
    for t in range(ci_a.shape[0]):
        sa = set(ci_a[t][ok_a[t]].tolist())
        sb = set(ci_b[t][ok_b[t]].tolist())
        assert sa == sb, f"tile {t}: {sorted(sa ^ sb)[:8]} differ"


@pytest.mark.parametrize("seed,z_ties", [(0, False), (1, True), (2, False)])
def test_selection_matches_topk_sets(seed, z_ties):
    rng = np.random.RandomState(seed)
    S, T, P = 64, 16, 640
    strip_cap, M = 256, 128
    px, py, z, rx, ry, valid = _random_splats(rng, P, z_ties)
    args = tuple(jnp.asarray(a) for a in (px, py, z, rx, ry))
    vmask = jnp.asarray(valid) & (args[2] >= 0)
    ci_x, ok_x, ovf_x = _xla_selection(*args, vmask, S, T, strip_cap, M)
    ci_p, ok_p, ovf_p = select_candidates_pallas(
        *args, vmask, S=S, T=T, nt=S // T, R=strip_cap, M=M,
        interpret=True)
    ci_p, ok_p = np.asarray(ci_p), np.asarray(ok_p)
    assert int(ovf_p) == ovf_x
    _assert_same_sets(ci_x, ok_x, ci_p, ok_p)


def test_selection_overflow_and_capacity():
    """Crowded strip: capacities bind, overflow counted, the front-most
    splats (by depth, ties by index) survive — top_k semantics."""
    rng = np.random.RandomState(3)
    S, T, P = 32, 16, 512
    strip_cap, M = 128, 128
    # everything piled into one tile so both capacities bind
    px = rng.uniform(0.4, 0.6, P).astype(np.float32)
    py = rng.uniform(0.4, 0.6, P).astype(np.float32)
    z = rng.uniform(0.5, 1.0, P).astype(np.float32)
    rx = np.full(P, 0.02, np.float32)
    ry = np.full(P, 0.02, np.float32)
    valid = np.ones(P, bool)
    args = tuple(jnp.asarray(a) for a in (px, py, z, rx, ry))
    ci_x, ok_x, ovf_x = _xla_selection(*args, jnp.asarray(valid), S, T,
                                       strip_cap, M)
    ci_p, ok_p, ovf_p = select_candidates_pallas(
        *args, jnp.asarray(valid), S=S, T=T, nt=S // T, R=strip_cap,
        M=M, interpret=True)
    assert ovf_x > 0 and int(ovf_p) == ovf_x
    _assert_same_sets(ci_x, ok_x, np.asarray(ci_p), np.asarray(ok_p))


def test_selection_no_strip_narrowing():
    """strip_cap >= P disables the strip stage on the XLA path; the
    kernel's threshold then admits every overlapping splat."""
    rng = np.random.RandomState(4)
    S, T, P = 32, 8, 200
    px, py, z, rx, ry, valid = _random_splats(rng, P)
    args = tuple(jnp.asarray(a) for a in (px, py, z, rx, ry))
    vmask = jnp.asarray(valid)
    ci_x, ok_x, ovf_x = _xla_selection(*args, vmask, S, T, 4096, 64)
    ci_p, ok_p, ovf_p = select_candidates_pallas(
        *args, vmask, S=S, T=T, nt=S // T, R=4096, M=64, interpret=True)
    assert int(ovf_p) == ovf_x
    _assert_same_sets(ci_x, ok_x, np.asarray(ci_p), np.asarray(ok_p))


def test_selection_under_vmap():
    """rasterize_splats vmaps _rasterize_one over B — the kernel must
    batch correctly (pallas adds a grid dim)."""
    rng = np.random.RandomState(6)
    S, T, P, B = 32, 8, 256, 2
    args = []
    for _ in range(B):
        args.append(_random_splats(rng, P))
    batched = [jnp.asarray(np.stack([a[i] for a in args]))
               for i in range(6)]
    px, py, z, rx, ry, valid = batched
    f = jax.vmap(lambda *a: select_candidates_pallas(
        *a, S=S, T=T, nt=S // T, R=128, M=64, interpret=True))
    ci, ok, ovf = f(px, py, z, rx, ry, valid)
    for b in range(B):
        ci_x, ok_x, ovf_x = _xla_selection(
            px[b], py[b], z[b], rx[b], ry[b], valid[b], S, T, 128, 64)
        assert int(ovf[b]) == ovf_x
        _assert_same_sets(ci_x, ok_x, np.asarray(ci[b]), np.asarray(ok[b]))


def test_full_pallas_path_bit_identical_fragments():
    """End-to-end: the Pallas rasterization path emits bit-identical
    fragment maps with the kernel or the XLA top_k coarse stage."""
    import dataclasses

    rng = np.random.RandomState(5)
    P, S = 384, 32
    pts = np.stack([rng.uniform(-0.9, 0.9, P),
                    rng.uniform(-0.9, 0.9, P),
                    rng.uniform(0.8, 2.0, P)], -1).astype(np.float32)
    ellipse = np.tile(np.array([80.0, 0.0, 80.0], np.float32), (P, 1))
    radii = np.full((P, 2), 0.12, np.float32)
    cutoff = np.ones(P, np.float32)
    valid = np.ones(P, bool)
    base = RasterizationSettings(image_size=S, tile_size=8,
                                 points_per_pixel=3,
                                 max_points_per_tile=128,
                                 max_points_per_strip=256,
                                 use_pallas=True)
    outs = {}
    for flag in (True, False):
        s = dataclasses.replace(base, use_pallas_selection=flag)
        outs[flag] = _rasterize_one(jnp.asarray(pts), jnp.asarray(ellipse),
                                    jnp.asarray(radii), jnp.asarray(cutoff),
                                    jnp.asarray(valid), s)
    for a, b, name in zip(outs[True][:6], outs[False][:6],
                          ("idx", "zbuf", "qvalue", "occ", "vis", "ovf")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
