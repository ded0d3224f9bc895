"""North-star parity gate: outputs/gradients vs the REFERENCE CPU kernels.

Compiles the reference's own `rasterize_points_cpu.cpp` (read-only, in
place at /root/reference — nothing is copied into this repo) against
torch-cpu and compares this framework's tiled rasterizer forward and
DSS occupancy backward against it on identical splat parameters
(SURVEY.md §7 M5: "validate pixel-grad allclose against reference CPU
rasterizer — this is the north-star correctness gate").

Skipped automatically when the toolchain or torch headers are absent.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_CPU = "/root/reference/DSS/csrc/rasterize_points_cpu.cpp"

_BINDING = r"""
#include <torch/extension.h>
#include <tuple>

std::tuple<torch::Tensor, torch::Tensor, torch::Tensor, torch::Tensor>
RasterizePointsNaiveCpu(const torch::Tensor &points,
                        const torch::Tensor &ellipse_params,
                        const torch::Tensor &cutoff_thres,
                        const torch::Tensor &radii,
                        const torch::Tensor &cloud_to_packed_first_idx,
                        const torch::Tensor &num_points_per_cloud,
                        const float depth_merging_thres,
                        const int image_size,
                        const int points_per_pixel);

torch::Tensor RasterizePointsOccBackwardCpu(
    const torch::Tensor &points, const torch::Tensor &radii,
    const torch::Tensor &grad_occ,
    const torch::Tensor &cloud_to_packed_first_idx,
    const torch::Tensor &num_points_per_cloud, const float radii_s,
    const float depth_merging_thres);

PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) {
  m.def("naive_forward", &RasterizePointsNaiveCpu);
  m.def("occ_backward", &RasterizePointsOccBackwardCpu);
}
"""


@pytest.fixture(scope="module")
def ref_kernels(tmp_path_factory):
    if not os.path.exists(REF_CPU):
        pytest.skip("reference source not mounted")
    try:
        import torch  # noqa: F401
        from torch.utils import cpp_extension
    except ImportError:
        pytest.skip("torch unavailable")
    # persistent build dir: torch cpp_extension.load skips the ~75 s
    # recompile when sources are unchanged (suite wall-time, VERDICT r3
    # weak item 6). Override with ISOPOINTS_TEST_REFBUILD.
    import pathlib
    build_dir = pathlib.Path(os.environ.get(
        "ISOPOINTS_TEST_REFBUILD", "/tmp/isopoints-ref-build"))
    build_dir.mkdir(parents=True, exist_ok=True)
    binding = build_dir / "binding.cpp"
    if (not binding.exists()) or binding.read_text() != _BINDING:
        binding.write_text(_BINDING)
    try:
        mod = cpp_extension.load(
            name="ref_raster_cpu",
            sources=[str(binding), REF_CPU],
            build_directory=str(build_dir),
            extra_cflags=["-O2"], verbose=False)
    except Exception as e:  # toolchain/header problems -> skip, not fail
        pytest.skip(f"could not build reference CPU kernels: {e}")
    return mod


@pytest.fixture(scope="module")
def splat_setup():
    from isopoints_tpu.core.camera import PerspectiveCamera, look_at_view_transform
    from isopoints_tpu.core.cloud import PointCloud
    from isopoints_tpu.rendering import RasterizationSettings, compute_splat_params

    k = jax.random.key(3)
    d = jax.random.normal(k, (160, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    cloud = PointCloud.create(points=(0.5 * d)[None], normals=d[None])
    R, T = look_at_view_transform(2.0, 10.0, 20.0)
    cam = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)
    s = RasterizationSettings(image_size=32, points_per_pixel=5,
                              tile_size=8, max_points_per_tile=160,
                              radii_backward_scaler=10.0)
    p = compute_splat_params(cloud.points, cloud.normals, cloud.mask, cam, s)
    return p, s


def _to_torch_packed(p):
    """Padded (1, P, ...) jax arrays -> packed torch tensors with ONLY
    the renderable points (the reference kernels take pre-filtered
    packed inputs; our mask plays the filter role)."""
    import torch

    m = np.asarray(p.mask)[0]
    pts = np.asarray(p.pts_ndc)[0][m]
    ell = np.asarray(p.ellipse)[0][m]
    cut = np.asarray(p.cutoff)[0][m]
    rad = np.asarray(p.radii)[0][m]
    t = lambda a: torch.from_numpy(np.ascontiguousarray(a, np.float32))
    first = torch.zeros(1, dtype=torch.int64)
    num = torch.full((1,), len(pts), dtype=torch.int64)
    return t(pts), t(ell), t(cut), t(rad), first, num, m


class TestForwardParityVsReference:
    def test_idx_zbuf_occupancy_match(self, ref_kernels, splat_setup):
        from isopoints_tpu.rendering import rasterize_splats

        p, s = splat_setup
        pts, ell, cut, rad, first, num, m = _to_torch_packed(p)
        r_idx, r_zbuf, r_qv, r_occ = ref_kernels.naive_forward(
            pts, ell, cut, rad, first, num,
            s.depth_merging_threshold, s.image_size, s.points_per_pixel)

        ours = rasterize_splats(p.pts_ndc, p.ellipse, p.radii, p.cutoff,
                                p.mask, s)
        # map our padded indices -> packed order used by the reference
        pad_to_packed = -np.ones(p.pts_ndc.shape[1], np.int32)
        pad_to_packed[np.flatnonzero(m)] = np.arange(int(m.sum()))
        our_idx = np.asarray(ours.idx[0])
        our_idx_packed = np.where(our_idx >= 0,
                                  pad_to_packed[np.maximum(our_idx, 0)], -1)

        np.testing.assert_array_equal(np.asarray(r_occ)[0],
                                      np.asarray(ours.occupancy[0]))
        np.testing.assert_array_equal(np.asarray(r_idx)[0], our_idx_packed)
        np.testing.assert_allclose(np.asarray(r_zbuf)[0],
                                   np.asarray(ours.zbuf[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(r_qv)[0],
                                   np.asarray(ours.qvalue[0]), atol=1e-5)


class TestPixelGradParityVsReference:
    def test_occ_backward_allclose(self, ref_kernels, splat_setup):
        """The reference ships THREE backward variants with different
        search windows (fast CUDA: per-cloud radial; slow CUDA:
        scaled-bbox OR; CPU: scaled-bbox AND). We implement the fast
        (production-default) semantics; to compare exactly against the
        buildable CPU kernel, use a radii_backward_scaler large enough
        that every window covers the whole image — the remaining logic
        (renderable gating, outside-splat positive-grad skip, the
        (pixel-point)/dist^2 formula, visibility filter) is identical
        across all variants."""
        import torch

        from dataclasses import replace as dc_replace

        from isopoints_tpu.rendering import rasterize_splats
        from isopoints_tpu.rendering.rasterizer import visible_point_mask

        p, s = splat_setup
        s = dc_replace(s, radii_backward_scaler=1000.0)
        pts, ell, cut, rad, first, num, m = _to_torch_packed(p)

        g_occ = jax.random.normal(jax.random.key(11), (1, 32, 32))

        # ours: d(sum(occ * g))/d pts_ndc — xy components
        def loss(pts_ndc):
            f = rasterize_splats(pts_ndc, p.ellipse, p.radii, p.cutoff,
                                 p.mask, s)
            return jnp.sum(f.occupancy * g_occ)

        ours = np.asarray(jax.grad(loss)(p.pts_ndc))[0][:, :2]

        # reference: packed, VISIBLE points only (rasterizer.py:850-863
        # filters to rendered points before the occ backward)
        frags = rasterize_splats(p.pts_ndc, p.ellipse, p.radii, p.cutoff,
                                 p.mask, s)
        vis_pad = np.asarray(visible_point_mask(
            frags.idx, p.pts_ndc.shape[1]))[0] & m
        vis_packed = vis_pad[m]
        t = lambda a: torch.from_numpy(np.ascontiguousarray(a, np.float32))
        pts_vis = t(np.asarray(p.pts_ndc)[0][vis_pad])
        rad_vis = t(np.asarray(p.radii)[0][vis_pad])
        first_v = torch.zeros(1, dtype=torch.int64)
        num_v = torch.full((1,), int(vis_pad.sum()), dtype=torch.int64)
        ref = ref_kernels.occ_backward(
            pts_vis, rad_vis, t(np.asarray(g_occ)), first_v, num_v,
            s.radii_backward_scaler, s.depth_merging_threshold)
        ref = np.asarray(ref)

        ours_vis = ours[vis_pad]
        scale = max(np.abs(ref).max(), 1.0)
        max_rel = np.abs(ours_vis - ref).max() / scale
        assert max_rel < 1e-5, f"pixel-grad vs reference: {max_rel}"
        # non-visible points must have zero gradient on both sides
        assert np.all(ours[~vis_pad] == 0.0)
