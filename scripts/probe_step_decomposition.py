"""Where does an ablation-scale combined training step spend its time?

VERDICT r4 item 5: decompose the 512px combined step (the uni-arm
geometry: 8000-point buffer, 3000 iso cap, 512px visibility render,
1024 rays, 256x3 SIREN + neural texture) into its stages with
separately-jitted sub-timers, plus the full step and the full-image
eval for context. Run on the real TPU with the box quiet; synthetic
inputs (timing only — the arithmetic is data-independent).

Usage: python scripts/probe_step_decomposition.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from isopoints_tpu.config import default_config_path, load_config  # noqa: E402
from isopoints_tpu.factories import create_model, create_trainer  # noqa: E402
from isopoints_tpu.core.camera import (  # noqa: E402
    PerspectiveCamera,
    look_at_view_transform,
)

REP = 4


def timeit(label, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)/REP*1e3:.1f} ms", file=sys.stderr)
    return min(ts) / REP


def scan_rep(body):
    """REP iterations of `body(carry)` inside one jit (tunnel latency
    amortization; identity-carry defeats hoisting)."""
    @jax.jit
    def f(*args):
        def step(carry, _):
            out = body(carry, *args)
            return out[0], out[1]
        _, outs = jax.lax.scan(step, jnp.float32(0), None, length=REP)
        return jax.tree_util.tree_map(lambda a: a[-1], outs)
    return f


def main():
    cfg = load_config("configs/ablation_compound_uni.yml",
                      default_config_path())
    model = create_model(cfg)
    trainer = create_trainer(model, cfg)
    params = model.init(jax.random.key(0))

    S = 512
    img = jnp.clip(jax.random.uniform(jax.random.key(1), (1, S, S, 3)),
                   0.2, 0.8)
    mask_img = jnp.ones((1, S, S, 1))
    R, T = look_at_view_transform([2.5], [10.0], [0.0])
    cam = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)

    state = trainer.init_state()
    pts, pmask = state.points, state.points_mask
    print(f"buffer {pts.shape}, iso cap "
          f"{model.ccfg.max_iso_per_batch}, vis {S}px", file=sys.stderr)

    # full step (projected path) — host-level timing like training pays
    state0 = state._replace(it=trainer.cfg.warm_up_iters + 1)
    t_step = []
    trainer.train_step(state0, img, mask_img, cam)  # compile
    for _ in range(4):
        t0 = time.perf_counter()
        trainer.train_step(state0, img, mask_img, cam)
        t_step.append(time.perf_counter() - t0)
    print(f"full train_step (projected, host-timed): "
          f"{min(t_step)*1e3:.1f} ms", file=sys.stderr)

    from isopoints_tpu.models.fields import sdf_and_grad as _sg
    from isopoints_tpu.rendering.rasterizer import splat_spacing
    from isopoints_tpu.models.levelset import project_points_newton

    f_trace = model.trace_sdf_fn(params)
    rset = model.raster_settings

    spacing = jax.jit(lambda p: splat_spacing(p, pmask, rset))(pts)
    normals = jax.jit(lambda p: _sg(f_trace, p)[1])(pts)
    jax.block_until_ready((spacing, normals))

    timeit("splat_spacing kNN (refresh-cadence)", scan_rep(
        lambda c, p: (c + 1.0, splat_spacing(p + 1e-30 * c, pmask, rset))),
        pts)
    timeit("point normals (fused sdf_and_grad)", scan_rep(
        lambda c, p: (c + 1.0, _sg(f_trace, p + 1e-30 * c)[1])), pts)
    timeit("visibility render (visible_points_mask)", scan_rep(
        lambda c, p: (c + 1.0, model.visible_points_mask(
            params, p + 1e-30 * c, pmask, normals, cam,
            spacing=spacing))), pts)
    timeit("iso projection+cap (get_visible_iso_points)", scan_rep(
        lambda c, p: (c + 1.0, model.get_visible_iso_points(
            params, p + 1e-30 * c, pmask, cam, jax.random.key(2),
            normals=normals, vis=pmask)[0])), pts)
    timeit("newton projection alone (8000 pts)", scan_rep(
        lambda c, p: (c + 1.0, project_points_newton(
            f_trace, p + 1e-30 * c, pmask,
            max_iters=model.proj_cfg.proj_max_iters,
            tolerance=model.proj_cfg.proj_tolerance).points)), pts)

    # full forward + loss + backward at step shapes (device-timed)
    from isopoints_tpu.training.trainer import compute_loss
    hp = {k: jnp.asarray(v, jnp.float32) for k, v in
          [("lambda_rgb", 1.0), ("lambda_freespace", 1.0),
           ("lambda_occupied", 1.0), ("lambda_eikonal", 0.01),
           ("sdf_alpha", 10.0)]}
    n_rays = trainer.cfg.n_rays
    pix = jax.random.uniform(jax.random.key(3), (1, n_rays, 2),
                             minval=-0.9, maxval=0.9)

    def fwd_bwd(c, p):
        def loss_fn(prm):
            l, _ = compute_loss(model, prm, p + 1e-30 * c, pmask, pix,
                                img, mask_img, cam, jax.random.key(4),
                                hp, True,
                                n_eikonal_points=trainer.cfg.n_eikonal_points,
                                spacing=spacing)
            return l
        l, g = jax.value_and_grad(loss_fn)(params)
        return l, l

    timeit("loss fwd+bwd (device-timed)", scan_rep(fwd_bwd), pts)

    # eval cadence cost
    t0 = time.perf_counter()
    trainer.eval_step_full(state0, img, mask_img, cam)
    print(f"eval_step_full (512px, incl compile on first call): "
          f"{(time.perf_counter()-t0)*1e3:.0f} ms", file=sys.stderr)
    t0 = time.perf_counter()
    trainer.eval_step_full(state0, img, mask_img, cam)
    print(f"eval_step_full (warm): {(time.perf_counter()-t0)*1e3:.0f} ms",
          file=sys.stderr)


if __name__ == "__main__":
    main()
