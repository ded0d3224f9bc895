"""Ray engine: sphere tracing, IDR bidirectional tracing, DVR secant.

Parity: reference DSS/models/levelset_sampling.py — `SphereTracing`
(:663-808), `RayTracing` (:810-1168, IDR), `ray_sampler` (:1034),
`secant` (:1114), `minimal_sdf_points` (:1135),
`find_zero_crossing_between_point_pairs` (:1210-1329), and
DSS/utils/__init__.py — `intersection_with_unit_cube` (:402),
`intersection_with_unit_sphere` (:484).

TPU re-design (SURVEY.md §7 M4): the reference runs every stage on a
shrinking boolean-indexed active set, chunked by `max_points_per_pass`
(80-120k points per CUDA pass). Here every stage is full-width over a
static `(B, N)` ray grid with masks:

  * sphere tracing = one `lax.while_loop`, masked updates — each
    iteration is a single batched MLP eval that rides the MXU; no
    compaction, no chunk loop (scale-out = shard rays over devices).
  * the dense sampler evaluates all `(B, N, n_steps)` proposals in one
    batched eval; "first sign change" is the sign·countdown argmin
    trick, identical math to the reference (:1061-1063).
  * the secant is a fixed-length `lax.scan` (8 steps) — branch-free.

No data-dependent shapes anywhere: callers get masks, not subsets.
"""

import math
from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from isopoints_tpu.utils import eps_denom

SDFFn = Callable[[jax.Array], jax.Array]  # (..., 3) -> (...)


# ---------------------------------------------------------------------------
# Ray / primitive intersections (utils/__init__.py:402-545)
# ---------------------------------------------------------------------------

def intersection_with_unit_cube(ray0: jax.Array, ray_dir: jax.Array,
                                side_length: float = 1.0, padding: float = 0.1,
                                eps: float = 1e-6
                                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Entry/exit intersections of rays with the padded unit cube.

    Args:
      ray0: (..., 3) origins (broadcastable against ray_dir).
      ray_dir: (..., 3) directions (not necessarily unit).
    Returns:
      (entry (..., 3), exit (..., 3), hit (...,) bool). Rays that miss
      get zeros and hit=False (parity: utils/__init__.py:402-483 keeps
      zeros for misses).
    """
    ray0 = jnp.broadcast_to(ray0, ray_dir.shape)
    half = side_length / 2.0 + padding / 2.0
    # six axis-aligned planes at ±half: t = (±half − o_i) / d_i
    o2 = jnp.concatenate([ray0, ray0], axis=-1)
    d2 = jnp.concatenate([ray_dir, ray_dir], axis=-1)
    plane = jnp.concatenate([jnp.full_like(ray0, half),
                             jnp.full_like(ray0, -half)], axis=-1)
    t = (plane - o2) / eps_denom(d2, 1e-12)                    # (..., 6)
    p = ray0[..., None, :] + t[..., None] * ray_dir[..., None, :]  # (..., 6, 3)
    on_cube = jnp.all((p <= half + eps) & (p >= -(half + eps)), axis=-1)  # (..., 6)
    hit = jnp.sum(on_cube.astype(jnp.int32), axis=-1) == 2

    big = 1e10
    t_valid = jnp.where(on_cube, t, big)
    t0 = jnp.min(t_valid, axis=-1)
    t1 = jnp.min(jnp.where(t_valid <= t0[..., None], big, t_valid), axis=-1)
    t0 = jnp.where(hit, t0, 0.0)
    t1 = jnp.where(hit, t1, 0.0)
    entry = ray0 + t0[..., None] * ray_dir
    exit_ = ray0 + t1[..., None] * ray_dir
    z = jnp.zeros_like(entry)
    entry = jnp.where(hit[..., None], entry, z)
    exit_ = jnp.where(hit[..., None], exit_, z)
    return entry, exit_, hit


def intersection_with_unit_sphere(cam_pos: jax.Array, rays: jax.Array,
                                  radius: float = 1.0
                                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Near/far intersections with a centered sphere.

    Misses fall back to the tangent-plane intersection (the plane
    tangent to the sphere, orthogonal to the view axis) exactly like
    the reference (utils/__init__.py:484-545) so downstream tracing
    still has a working interval.

    Args:
      cam_pos: (..., 3) broadcastable origins; rays: (..., 3) unit dirs.
    Returns (near (...,3), far (...,3), hit (...)).
    """
    p = jnp.broadcast_to(cam_pos, rays.shape)
    q = rays
    ptq = jnp.sum(p * q, axis=-1)                     # ⟨o, d⟩
    mid = p - ptq[..., None] * q                      # closest point to center
    dist = jnp.linalg.norm(mid, axis=-1)
    cam_dist = jnp.linalg.norm(p, axis=-1)
    hit = dist <= radius

    half_chord = jnp.sqrt(jnp.maximum(radius * radius - dist * dist, 0.0))
    chord = jnp.where(hit, 2.0 * half_chord, 10.0)
    z_near_hit = jnp.sqrt(jnp.maximum(cam_dist * cam_dist - dist * dist, 0.0)) - half_chord
    # tangent-plane fallback for misses
    z_near_miss = (cam_dist - radius) / eps_denom(-ptq / jnp.maximum(cam_dist, 1e-12))
    z_far_miss = (cam_dist + radius) / eps_denom(-ptq / jnp.maximum(cam_dist, 1e-12))
    z_near = jnp.where(hit, z_near_hit, z_near_miss)
    near = z_near[..., None] * q + p
    far = jnp.where(hit[..., None], near + chord[..., None] * q,
                    z_far_miss[..., None] * q + p)
    return near, far, hit


# ---------------------------------------------------------------------------
# Sphere tracing along given rays (SphereTracing, levelset_sampling.py:663-808)
# ---------------------------------------------------------------------------

class SphereTraceResult(NamedTuple):
    points: jax.Array   # (..., 3) final positions
    sdf: jax.Array      # (...,) SDF at final positions
    grad: jax.Array     # (..., 3) SDF gradient at the FIRST iterate
                        # (matches the reference returning the initial
                        # grad cache, levelset_sampling.py:746-754)
    mask: jax.Array     # (...,) converged (|sdf| ≤ tolerance)


def sphere_trace_along_rays(sdf_fn: SDFFn, ray0: jax.Array, ray_dir: jax.Array,
                            mask: Optional[jax.Array] = None,
                            max_iters: int = 10, tolerance: float = 5e-5,
                            alpha: float = 1.0, radius: float = 1.0,
                            padding: float = 0.1,
                            step_clip: float = 0.1) -> SphereTraceResult:
    """March p ← p + α·f(p)·d, step clamped to `step_clip`, stopping when
    |f| ≤ 0.1·tolerance or the point leaves the radius+padding sphere.

    Convergence reported against the full `tolerance` like the
    reference (levelset_sampling.py:764,793).
    """
    if mask is None:
        mask = jnp.ones(ray0.shape[:-1], dtype=bool)
    ray_dir = ray_dir / jnp.maximum(
        jnp.linalg.norm(ray_dir, axis=-1, keepdims=True), 1e-15)

    # one vjp for the initial value + gradient cache
    sdf0, vjp = jax.vjp(sdf_fn, ray0)
    (grad0,) = vjp(jnp.ones_like(sdf0))

    inside = jnp.linalg.norm(ray0, axis=-1) < (radius + padding)

    def cond(state):
        _, sdf, active, it = state
        return (it < max_iters) & jnp.any(active)

    def body(state):
        pts, sdf, active, it = state
        move = alpha * sdf[..., None] * ray_dir
        mnorm = jnp.linalg.norm(move, axis=-1, keepdims=True)
        move = move / jnp.maximum(mnorm, 1e-15) * jnp.minimum(mnorm, step_clip)
        cand = pts + move
        in_sphere = jnp.linalg.norm(cand, axis=-1) < (radius + padding)
        pts = jnp.where((active & in_sphere)[..., None], cand, pts)
        sdf_new = sdf_fn(pts)
        sdf = jnp.where(active, sdf_new, sdf)
        active = active & in_sphere & (jnp.abs(sdf) > 0.1 * tolerance)
        return pts, sdf, active, it + 1

    active0 = mask & inside & (jnp.abs(sdf0) > 0.1 * tolerance)
    pts, sdf, _, _ = jax.lax.while_loop(
        cond, body, (ray0, sdf0, active0, jnp.int32(0)))
    return SphereTraceResult(points=pts, sdf=sdf, grad=grad0,
                             mask=mask & (jnp.abs(sdf) <= tolerance))


# ---------------------------------------------------------------------------
# IDR bidirectional ray tracing (RayTracing, levelset_sampling.py:810-1168)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class RayTracingConfig:
    """Knobs mirroring RayTracing.__init__ (levelset_sampling.py:812-828)."""
    object_bounding_sphere: float = 1.0
    sdf_threshold: float = 5e-5
    line_search_step: float = 0.5
    line_step_iters: int = 1
    sphere_tracing_iters: int = 10
    n_steps: int = 100
    n_secant_steps: int = 8
    # rays per dense-sampler evaluation chunk; 0 = full width. Bounds
    # the (rays × n_steps × hidden) MLP activation footprint the same
    # way the reference's 80k-point chunks do (levelset_sampling.py:1057)
    # but as a lax.map inside jit, not a host loop.
    sampler_chunk_rays: int = 0
    # fraction of rays given a dense-sampler slot; 1.0 = all rays. The
    # reference runs the sampler only on unconverged rays (a dynamic
    # subset, :858-871); on TPU we compact the unconverged rays into a
    # STATIC ceil(frac·N) buffer with top_k, sample those, and scatter
    # back — bounded work, same result when the unconverged count fits
    # (sphere tracing converges the vast majority).
    sampler_fraction: float = 1.0
    # straggler compaction: run `trace_compact_after` full-width sphere-
    # tracing iterations, then compact still-unfinished rays into a
    # ceil(frac·N) buffer and finish there. 0 disables. Saves the
    # straggler iterations' full-width MLP evals (the while_loop only
    # exits when EVERY ray is done). Also accepts TUPLES for a chain of
    # stages, e.g. after=(6, 8), fraction=(0.5, 0.3): compact to 0.5·N
    # at iteration 6 and re-compact the buffer to 0.3·N at iteration 8
    # (fractions are of the ORIGINAL ray count). Tune against the
    # measured active-ray decay; overflow is counted per stage.
    trace_compact_after: Union[int, Tuple[int, ...]] = 0
    trace_compact_fraction: Union[float, Tuple[float, ...]] = 0.25
    # coarse/fine precision schedule: run the first `coarse_trace_iters`
    # sphere-tracing iterations with `sdf_fn_coarse` (e.g. the 1-pass
    # bf16 fused MLP, ~1.67x faster than f32x3), then re-validate ALL
    # fronts full-width with the fine fn and finish with it. The coarse
    # phase only moves fronts that are still far from the surface; the
    # fine boundary re-validation resurrects any front the coarse noise
    # stopped early, so converged rays always satisfy |f_fine| <= thr.
    # Fronts judged crossed (f < 0) get the same treatment as in the
    # pure path (stop where the backstep left them; the noise adds
    # <= ~1e-3 depth error to that already-imprecise class). 0 = off.
    coarse_trace_iters: int = 0
    # run the dense sampler's n_steps sweep with the coarse fn too; the
    # secant BRACKET endpoints are then re-evaluated at fine precision
    # (2 extra evals/ray vs n_steps saved), so the secant refinement and
    # the surface-hit decision rest on fine values. Identity when the
    # coarse fn equals the fine fn.
    sampler_coarse: bool = False
    # hysteresis for the coarse first-sign-change pick: treat a step as
    # "inside" only when f_coarse < −margin. WITHOUT it, coarse noise
    # near zero creates false first crossings on grazing rays; the fine
    # bracket re-check then rejects the ray outright and a TRUE crossing
    # later on the ray is lost (measured on the bench workload: 136990
    # vs 158355 fine-sampler hits at margin 0 — a silent 13% hit loss).
    # Set to ~3-4x the coarse fn's absolute noise (bf16 fused MLP:
    # ~1e-3); hits whose max penetration stays under the margin are
    # still missed — measure against the fine sampler when tuning.
    # Ignored when the sweep runs at fine precision.
    sampler_coarse_margin: float = 0.0
    # fused backstep: the reference's line-search backstep re-evaluates
    # BOTH fronts full-width inside the same iteration — a second MLP
    # eval that serves only the ~5% of rays that crossed (measured on
    # the bench workload). With fused_backstep=True each loop iteration
    # does exactly ONE eval: a ray that crossed takes its backstep as
    # its NEXT iteration's move (same trajectory rule, scale
    # (1−line_search_step)/2^i per consecutive backstep). The iteration
    # budget is shared between forward steps and backsteps, so give the
    # loop ~20% more iterations for the same convergence; at equal eval
    # budget it converges strictly more rays (each iteration costs half).
    # Applies to FINE-precision loops only: a noisy bf16 coarse fn makes
    # fronts near the surface cross-backstep-recross every other
    # iteration (measured 42-60k crossings/iter on the bench workload),
    # so coarse loops always keep the in-iteration backstep.
    fused_backstep: bool = False
    # coarse stall-on-cross: in COARSE loops, a front that crosses
    # (f < 0) reverts to its last outside position (no re-eval needed —
    # its value is already in state) and stalls until the fine boundary
    # re-validation resurrects it. One eval per coarse iteration
    # instead of 1 + line_step_iters, and the fine phase — which has
    # exact values and the cheap fused backstep — does the near-surface
    # work the coarse backstep would have wasted bf16 evals on.
    # Crossing rays forfeit their remaining coarse iterations; they are
    # by definition already at the surface. Fine loops are unaffected.
    coarse_stall_on_cross: bool = False
    # run the phase-2 compacted straggler loop with the coarse fn too,
    # then re-validate its fronts once at fine precision: fronts the
    # coarse noise stopped early are simply marked unfinished (no more
    # marching budget exists) and fall to the dense sampler. Identity
    # when coarse == fine. Requires trace_compact_after > 0.
    trace_compact_coarse: bool = False
    # sampler presweep: before the dense n_steps sweep, evaluate
    # `sampler_presweep` uniform steps per ray and CERTIFY rays that
    # cannot contain a zero crossing: an interval [a, b] is crossing-
    # free when sign(f_a) == sign(f_b) and min(|f_a|, |f_b|) >
    # lipschitz·(b − a). Sound for L-Lipschitz fields with
    # L ≤ `sampler_presweep_lipschitz` (true SDFs have L = 1;
    # eikonal-trained fields ≈ 1 — the default 2.0 is the safety
    # margin; this is a HEURISTIC for learned fields, 0 presweep steps
    # disables it). Certified rays skip the dense sweep and take their
    # min-SDF point from the presweep grid (they are non-surface);
    # flagged rays are compacted into a ceil(sampler_dense_fraction ·
    # width) buffer and swept densely as usual. Flagged rays beyond
    # capacity are treated as non-surface and counted in
    # sampler_overflow.
    sampler_presweep: int = 0
    sampler_presweep_lipschitz: float = 2.0
    sampler_dense_fraction: float = 0.5
    # in-kernel marching for the compacted FINE fused-backstep stages:
    # when sdf_fn is a fused Pallas MLP (carries `.fused_trace_stepper`,
    # ops/pallas_trace.py), each stage's while_loop is replaced by one
    # kernel marching the stage's fixed iteration count with per-ray
    # state in VMEM — bit-identical per-iteration math, and a fixed
    # count equals the while_loop because finished rays take zero-
    # length moves (measured: the staged fine marching is ~72 of
    # 128 ms at 262k rays, mostly per-iteration XLA glue). Requires
    # fused_backstep; coarse stages and plain sdf_fns fall back.
    trace_in_kernel: bool = False
    # in-kernel dense sampler: when sdf_fn is a fused Pallas MLP
    # (carries `.fused_ray_sampler`, ops/pallas_sampler.py), march the
    # n_steps sweep + bracket re-validation + secant INSIDE the kernel —
    # per-ray state stays in VMEM and nothing of size (rays × n_steps)
    # is ever materialized (the XLA sweep moves ~29 MB of proposal
    # points through HBM per 24.5k-ray frame plus two argmin/gather
    # rounds). Output-equivalent to the XLA path (equivalence-tested).
    # REQUIREMENT: with sampler_coarse=True, sdf_fn_coarse must be the
    # 'bf16' fused variant of the SAME weights as sdf_fn (what
    # ImplicitModel.trace_sdf_fn_coarse and bench.py construct) — the
    # in-kernel coarse sweep reads the bf16-hi half of sdf_fn's own
    # weight pack, which is bit-identical to that variant. Plain
    # (non-fused) sdf_fns fall back to the XLA path silently.
    sampler_in_kernel: bool = False
    # gate the end (far-side) front on the start front: once a ray's
    # START front is finished (converged or crossed), stop marching its
    # END front. acc_e is read downstream only as (a) the sampler's
    # t_hi — and the sampler runs only on start-unfinished rays, whose
    # end fronts are NOT gated — and (b) the acc_s < acc_e hit test.
    # Under fused backsteps acc_e is NOT non-increasing (a backstep
    # moves it back up), so the gate must let a PENDING end-front
    # backstep (bk_e > 0) drain before freezing: freezing mid-backstep
    # would park acc_e at an overshot (too-small) position and could
    # flip a genuine hit to a miss via the acc_s < acc_e test. With
    # that keep-alive, a gated end front always freezes at an outside
    # (post-backstep or pre-cross) position. Effect: the compaction
    # active set shrinks from (un_s | un_e) toward un_s, so
    # trace_compact_fraction can be tuned tighter, and the while_loop
    # exits as soon as every START front is done. Caveat: a start front
    # that coarse noise stopped early gates its end front until the
    # fine re-validation resurrects it, so that ray's sampler interval
    # can end slightly wider — re-measure hit recall vs the all-fine
    # pipeline when enabling (scripts/probe_trace_decay.py).
    trace_gate_end_front: bool = False



def _compact_mask(mask: jax.Array, cap: int) -> Tuple[jax.Array, jax.Array]:
    """(B, N) bool -> (sel (B, cap) indices, sel_ok (B, cap) bool):
    the first `cap` True positions per row, in index order.

    Exactly `top_k(mask.astype(f32), cap)` — equal scores tie-break by
    first occurrence, and overflow drops the highest-index actives —
    but via cumsum-rank + one scatter instead of a full N-element sort
    (top_k over 262k rays costs ~3 ms each on a v5e; three compactions
    run per trace)."""
    b, n = mask.shape
    ranks = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1       # (B, N)
    put = jnp.where(mask & (ranks < cap), ranks, cap)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    sel = jax.vmap(lambda p, i: jnp.zeros((cap,), jnp.int32).at[p].set(
        i, mode="drop"))(put, iota)
    n_active = jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True)
    sel_ok = jnp.arange(cap)[None, :] < n_active
    return sel, sel_ok


def _masked_scatter(dst: jax.Array, sel: jax.Array, src: jax.Array,
                    sel_ok: jax.Array) -> jax.Array:
    """Row-batched masked scatter: dst[b, sel[b, j]] = src[b, j] where
    sel_ok[b, j]; disabled slots are dropped via an out-of-range index
    (the shared compact-process-scatter idiom of this module)."""
    n = dst.shape[1]
    return jax.vmap(
        lambda d, i, v, ok: d.at[jnp.where(ok, i, n)].set(
            jnp.where(ok, v, jnp.zeros((), v.dtype)), mode="drop")
    )(dst, sel, src, sel_ok)


def _compact_gather(sel: jax.Array, cols) -> list:
    """ONE wide same-index gather for a compaction stage.

    XLA does NOT merge same-index gathers on TPU — each (B, N)-indexed
    take_along_axis costs ~2 ms per 262k rows REGARDLESS of row width
    (CLAUDE.md, measured on the splat path) — so the per-stage state
    gathers must ride one wide row gather. `cols` is a sequence of
    (B, N) or (B, N, k) arrays; returns them gathered to (B, cap[, k]),
    dtypes preserved (non-f32 round-trips through f32 — exact for the
    bools and small int counters this module carries)."""
    parts, meta = [], []
    for a in cols:
        x = a[..., None] if a.ndim == 2 else a
        parts.append(x.astype(jnp.float32))
        meta.append((a.ndim == 2, a.dtype, x.shape[-1]))
    table = jnp.concatenate(parts, axis=-1)                     # (B, N, C)
    g = jnp.take_along_axis(table, sel[..., None], axis=1)      # (B, cap, C)
    outs, off = [], 0
    for was2d, dt, k in meta:
        v = g[..., off:off + k]
        off += k
        outs.append(v[..., 0].astype(dt) if was2d else v.astype(dt))
    return outs


def _masked_scatter_wide(dsts, sel: jax.Array, srcs, sel_ok: jax.Array
                         ) -> list:
    """ONE wide masked scatter for same-index rows (same rationale as
    `_compact_gather`): dsts/srcs are matching sequences of (B, N) /
    (B, cap) arrays; returns the updated dsts, dtypes preserved."""
    n = dsts[0].shape[1]
    dt_tab = jnp.stack([d.astype(jnp.float32) for d in dsts], axis=-1)
    src_tab = jnp.stack([s.astype(jnp.float32) for s in srcs], axis=-1)
    out = jax.vmap(
        lambda d, i, v, ok: d.at[jnp.where(ok, i, n)].set(
            jnp.where(ok[:, None], v, 0.0), mode="drop")
    )(dt_tab, sel, src_tab, sel_ok)
    return [out[..., j].astype(d.dtype) for j, d in enumerate(dsts)]


def _eval_sdf_chunked(sdf_fn: SDFFn, pts: jax.Array, chunk_rays: int
                      ) -> jax.Array:
    """Evaluate sdf over (B, N, S, 3) proposals, lax.map-chunked over
    rays to bound peak activation memory."""
    if chunk_rays <= 0:
        return sdf_fn(pts)
    b, n, s, _ = pts.shape
    total = b * n
    pad = (-total) % chunk_rays
    flat = pts.reshape(total, s, 3)
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, s, 3), flat.dtype)], axis=0)
    out = jax.lax.map(sdf_fn, flat.reshape(-1, chunk_rays, s, 3))
    return out.reshape(-1, s)[:total].reshape(b, n, s)


class RayTraceResult(NamedTuple):
    points: jax.Array              # (B, N, 3) surface / fallback points
    dists: jax.Array               # (B, N) ray lengths
    network_object_mask: jax.Array  # (B, N) ray hits the implicit surface
    mask_intersect: jax.Array      # (B, N) ray intersects bounding sphere
    sampler_mask: jax.Array        # (B, N) handled by the dense sampler
    # static-capacity compaction overflow counters (scalar int32): rays
    # beyond `trace_compact_fraction` capacity in the phase-2 straggler
    # trace (kept at phase-1 state) and beyond `sampler_fraction`
    # capacity in the dense sampler (treated as non-surface). Non-zero
    # counts mean the capacities silently degrade quality — monitor
    # them (trainer metrics `overflow_trace` / `overflow_sampler`).
    trace_overflow: jax.Array = None
    sampler_overflow: jax.Array = None


def _secant_scan(sdf_fn: SDFFn, f_low, f_high, z_low, z_high, origins, dirs,
                 n_steps: int) -> jax.Array:
    """Fixed-step secant for f(o + z·d) = 0 on [z_low, z_high].

    Parity: RayTracing.secant (levelset_sampling.py:1114-1133);
    branch-free lax.scan with masked bound updates.
    """
    def z_pred_of(fl, fh, zl, zh):
        return -fl * (zh - zl) / eps_denom(fh - fl, 1e-12) + zl

    def step(carry, _):
        fl, fh, zl, zh = carry
        z = z_pred_of(fl, fh, zl, zh)
        f_mid = sdf_fn(origins + z[..., None] * dirs)
        low = f_mid > 0
        zl = jnp.where(low, z, zl)
        fl = jnp.where(low, f_mid, fl)
        high = f_mid < 0
        zh = jnp.where(high, z, zh)
        fh = jnp.where(high, f_mid, fh)
        return (fl, fh, zl, zh), None

    (f_low, f_high, z_low, z_high), _ = jax.lax.scan(
        step, (f_low, f_high, z_low, z_high), None, length=n_steps)
    return z_pred_of(f_low, f_high, z_low, z_high)


def _bidirectional_sphere_trace(sdf_fn: SDFFn, cam_loc, ray_dirs,
                                mask_intersect, t_near, t_far,
                                cfg: RayTracingConfig,
                                sdf_fn_coarse: Optional[SDFFn] = None):
    """March start (+) and end (−) fronts until both stall or cross.

    Parity: RayTracing.sphere_tracing (levelset_sampling.py:920-1032)
    including the line-search backstep on surface crossings.

    With `trace_compact_after` > 0, runs two phases: full-width
    iterations until the cut, then top_k-compacts still-unfinished
    rays into a ceil(frac·N) buffer and finishes there — the while_loop
    only exits when EVERY ray is done, so straggler iterations
    otherwise pay full-width MLP evals.
    """
    thr = cfg.sdf_threshold

    # Loop state layout (extended, used by both bodies):
    #   (acc_s, acc_e, sdf_s, sdf_e, un_s, un_e,
    #    bk_s, bk_e, cur_s, cur_e, it)
    # bk_*: int32 pending-backstep counter (0 = none; i = the i-th
    # consecutive backstep runs next iteration); cur_*: the forward
    # step being backstepped. Both are dead weight for the reference
    # body (identity-carried) and the engine of the fused one.

    def extend(state7):
        z = jnp.zeros_like(state7[2])
        zi = jnp.zeros(state7[2].shape, jnp.int32)
        return state7[:6] + (zi, zi, z, z, state7[6])

    def make_loop(cam, dirs, start_it: int, max_iters: int, fn=None):
        is_coarse = fn is not None and fn is not sdf_fn
        fn = fn or sdf_fn

        def eval_pair(ts, te):
            # both fronts in ONE batched eval: halves kernel launches
            # in the hot loop (matters with the fused Pallas MLP)
            both = fn(jnp.concatenate(
                [cam + ts[..., None] * dirs,
                 cam + te[..., None] * dirs], axis=-2))
            n = ts.shape[-1]
            return both[..., :n], both[..., n:]

        def cond(state):
            un_s, un_e, it = state[4], state[5], state[10]
            return (it < max_iters) & (jnp.any(un_s) | jnp.any(un_e))

        def body(state):
            """Reference semantics: advance + in-iteration line-search
            backstep (second full-width eval per iteration). The fused
            pending-backstep extras (bk, saved cur) pass through
            UNTOUCHED so a mixed fused/reference stage chain cannot
            clobber a pending backstep's step size."""
            acc_s, acc_e, sdf_s, sdf_e, un_s, un_e = state[:6]
            bk_s, bk_e, keep_cur_s, keep_cur_e, it = state[6:]
            cur_s = jnp.where(un_s & (sdf_s > thr), sdf_s, 0.0)
            cur_e = jnp.where(un_e & (sdf_e > thr), sdf_e, 0.0)
            acc_s = acc_s + cur_s
            acc_e = acc_e - cur_e
            new_s, new_e = eval_pair(acc_s, acc_e)

            # line-search backstep where a front crossed inside (sdf<0)
            def back_step(carry, i):
                acc_s, acc_e, new_s, new_e = carry
                scale = (1.0 - cfg.line_search_step) / (2.0 ** i)
                bs = un_s & (new_s < 0)
                be = un_e & (new_e < 0)
                acc_s = jnp.where(bs, acc_s - scale * cur_s, acc_s)
                acc_e = jnp.where(be, acc_e + scale * cur_e, acc_e)
                ev_s, ev_e = eval_pair(acc_s, acc_e)
                new_s = jnp.where(bs, ev_s, new_s)
                new_e = jnp.where(be, ev_e, new_e)
                return (acc_s, acc_e, new_s, new_e), None

            (acc_s, acc_e, new_s, new_e), _ = jax.lax.scan(
                back_step, (acc_s, acc_e, new_s, new_e),
                jnp.arange(cfg.line_step_iters, dtype=jnp.float32))

            not_crossed = acc_s < acc_e
            un_s = un_s & (new_s > thr) & not_crossed
            un_e = un_e & (new_e > thr) & not_crossed
            if cfg.trace_gate_end_front:
                un_e = un_e & un_s
            return (acc_s, acc_e, new_s, new_e, un_s, un_e,
                    bk_s, bk_e, keep_cur_s, keep_cur_e, it + 1)

        def body_fused(state):
            """One eval per iteration: a crossing takes its backstep as
            the NEXT iteration's move (RayTracingConfig.fused_backstep).
            Same per-ray trajectory rule as `body`; the iteration budget
            is shared between forward steps and backsteps."""
            (acc_s, acc_e, sdf_s, sdf_e, un_s, un_e,
             bk_s, bk_e, cur_s, cur_e, it) = state
            fwd_s = jnp.where(un_s & (bk_s == 0) & (sdf_s > thr), sdf_s, 0.0)
            fwd_e = jnp.where(un_e & (bk_e == 0) & (sdf_e > thr), sdf_e, 0.0)
            # i-th consecutive backstep scale: (1−ls)/2^(i−1), i ≥ 1
            scl = (1.0 - cfg.line_search_step)
            scale_s = scl * jnp.exp2(-(bk_s - 1).astype(jnp.float32))
            scale_e = scl * jnp.exp2(-(bk_e - 1).astype(jnp.float32))
            move_s = jnp.where(bk_s > 0, -scale_s * cur_s, fwd_s)
            move_e = jnp.where(bk_e > 0, -scale_e * cur_e, fwd_e)
            acc_s = acc_s + move_s
            acc_e = acc_e - move_e
            new_s, new_e = eval_pair(acc_s, acc_e)

            # crossing (or still-negative after a backstep, budget left)
            # schedules (another) backstep; otherwise apply the stop rule
            may_s = un_s & (new_s < 0) & (bk_s < cfg.line_step_iters)
            may_e = un_e & (new_e < 0) & (bk_e < cfg.line_step_iters)
            cur_s = jnp.where(may_s & (bk_s == 0), fwd_s, cur_s)
            cur_e = jnp.where(may_e & (bk_e == 0), fwd_e, cur_e)
            bk_s = jnp.where(may_s, bk_s + 1, 0)
            bk_e = jnp.where(may_e, bk_e + 1, 0)

            not_crossed = acc_s < acc_e
            un_s = un_s & ((bk_s > 0) | ((new_s > thr) & not_crossed))
            un_e = un_e & ((bk_e > 0) | ((new_e > thr) & not_crossed))
            if cfg.trace_gate_end_front:
                # keep-alive: drain a pending end-front backstep before
                # freezing, else acc_e parks at an overshot position
                un_e = un_e & (un_s | (bk_e > 0))
            return (acc_s, acc_e, new_s, new_e, un_s, un_e,
                    bk_s, bk_e, cur_s, cur_e, it + 1)

        def body_stall(state):
            """One eval per COARSE iteration: a crossing front reverts
            to its last outside position (whose value is already in
            state) and stalls until the fine boundary re-validation
            resurrects it (RayTracingConfig.coarse_stall_on_cross)."""
            (acc_s, acc_e, sdf_s, sdf_e, un_s, un_e,
             bk_s, bk_e, cur_s, cur_e, it) = state
            fwd_s = jnp.where(un_s & (sdf_s > thr), sdf_s, 0.0)
            fwd_e = jnp.where(un_e & (sdf_e > thr), sdf_e, 0.0)
            acc_s = acc_s + fwd_s
            acc_e = acc_e - fwd_e
            new_s, new_e = eval_pair(acc_s, acc_e)
            crossed_s = un_s & (new_s < 0)
            crossed_e = un_e & (new_e < 0)
            acc_s = jnp.where(crossed_s, acc_s - fwd_s, acc_s)
            acc_e = jnp.where(crossed_e, acc_e + fwd_e, acc_e)
            new_s = jnp.where(crossed_s, sdf_s, new_s)
            new_e = jnp.where(crossed_e, sdf_e, new_e)
            not_crossed = acc_s < acc_e
            un_s = un_s & ~crossed_s & (new_s > thr) & not_crossed
            un_e = un_e & ~crossed_e & (new_e > thr) & not_crossed
            if cfg.trace_gate_end_front:
                un_e = un_e & un_s
            return (acc_s, acc_e, new_s, new_e, un_s, un_e,
                    bk_s, bk_e, cur_s, cur_e, it + 1)

        def run(state):
            if is_coarse and cfg.coarse_stall_on_cross:
                chosen = body_stall
            elif cfg.fused_backstep and not is_coarse:
                chosen = body_fused
            else:
                chosen = body
            return jax.lax.while_loop(
                cond, chosen, state[:10] + (jnp.int32(start_it),))

        return run, eval_pair

    # normalize compaction stages: int -> single stage, tuple -> chain;
    # stages at/after the last iteration are no-ops and dropped
    raw_stages = cfg.trace_compact_after
    raw_fracs = cfg.trace_compact_fraction
    if isinstance(raw_stages, int):
        raw_stages = (raw_stages,) if raw_stages > 0 else ()
    if isinstance(raw_fracs, float):
        raw_fracs = (raw_fracs,) * len(raw_stages)
    keep = [(a, f) for a, f in zip(raw_stages, raw_fracs)
            if 0 < a < cfg.sphere_tracing_iters]
    stages = tuple(a for a, _ in keep)
    fracs = tuple(f for _, f in keep)
    assert list(stages) == sorted(set(stages)), \
        ("trace_compact_after stages must be strictly increasing", stages)

    full_end = stages[0] if stages else cfg.sphere_tracing_iters
    coarse_end = (min(cfg.coarse_trace_iters, full_end)
                  if sdf_fn_coarse is not None else 0)
    if (sdf_fn_coarse is not None and stages
            and cfg.coarse_trace_iters > stages[0]):
        # per-stage precision is whole-stage: a stage spanning the
        # coarse->fine boundary would silently run its coarse
        # iterations at fine width/cost
        bounds_all = stages + (cfg.sphere_tracing_iters,)
        assert cfg.coarse_trace_iters in bounds_all, (
            "coarse_trace_iters must align with a compaction-stage "
            "boundary when compaction starts inside the coarse phase",
            cfg.coarse_trace_iters, bounds_all)

    _, eval_pair = make_loop(cam_loc, ray_dirs, 0, 0)

    if coarse_end > 0:
        # ---- coarse phase: march the easy distance with the fast fn
        run_coarse, eval_pair_c = make_loop(cam_loc, ray_dirs, 0,
                                            coarse_end, fn=sdf_fn_coarse)
        c_s0, c_e0 = eval_pair_c(t_near, t_far)
        c_s0 = jnp.where(mask_intersect, c_s0, 0.0)
        c_e0 = jnp.where(mask_intersect, c_e0, 0.0)
        state = run_coarse(extend((t_near, t_far, c_s0, c_e0,
                                   mask_intersect & (c_s0 > thr),
                                   mask_intersect & (c_e0 > thr),
                                   jnp.int32(0))))
        acc_s, acc_e = state[0], state[1]
        bk_s, bk_e, cur_s, cur_e = state[6:10]
        # ---- boundary re-validation at FINE precision: recompute the
        # front states from scratch so coarse noise can neither leave a
        # ray converged at |f_fine| > thr nor stop a front early.
        # Identity when sdf_fn_coarse == sdf_fn (fronts are stationary
        # once stopped and evals are deterministic). Pending fused
        # backsteps (bk > 0) stay unfinished so the fine loop completes
        # them.
        sdf_s, sdf_e = eval_pair(acc_s, acc_e)
        sdf_s = jnp.where(mask_intersect, sdf_s, 0.0)
        sdf_e = jnp.where(mask_intersect, sdf_e, 0.0)
        not_crossed = acc_s < acc_e
        un_s0 = mask_intersect & (((sdf_s > thr) & not_crossed)
                                  | (bk_s > 0))
        un_e0 = mask_intersect & (((sdf_e > thr) & not_crossed)
                                  | (bk_e > 0))
        if cfg.trace_gate_end_front:
            un_e0 = un_e0 & (un_s0 | (bk_e > 0))
        sdf_start0, sdf_end0 = sdf_s, sdf_e
        extras = (bk_s, bk_e, cur_s, cur_e)
        start_state = (acc_s, acc_e)
    else:
        sdf_start0, sdf_end0 = eval_pair(t_near, t_far)
        sdf_start0 = jnp.where(mask_intersect, sdf_start0, 0.0)
        sdf_end0 = jnp.where(mask_intersect, sdf_end0, 0.0)
        un_s0 = mask_intersect & (sdf_start0 > thr)
        un_e0 = mask_intersect & (sdf_end0 > thr)
        if cfg.trace_gate_end_front:
            un_e0 = un_e0 & un_s0
        extras = None
        start_state = (t_near, t_far)

    run_full, _ = make_loop(cam_loc, ray_dirs, coarse_end, full_end)
    state7 = start_state + (sdf_start0, sdf_end0, un_s0, un_e0,
                            jnp.int32(0))
    full_state = extend(state7)
    if extras is not None:
        full_state = full_state[:6] + extras + full_state[10:]
    state = run_full(full_state)
    acc_s, acc_e, sdf_s, sdf_e, un_s, un_e = state[:6]
    bk_s, bk_e, cur_s, cur_e, it = state[6:]

    no_overflow = jnp.zeros((), jnp.int32)
    if not stages:
        return acc_s, acc_e, un_s, no_overflow

    # ---- compacted straggler stages: top_k-compact still-active rays
    # into a ceil(frac·N) buffer at each stage boundary and march the
    # buffer to the next boundary. Buffers nest (stage k+1 compacts
    # stage k's buffer); scatters unwind in reverse at the end.
    b, n0 = un_s.shape
    p2_coarse = cfg.trace_compact_coarse and sdf_fn_coarse is not None
    boundaries = list(stages[1:]) + [cfg.sphere_tracing_iters]

    cam_g, dirs_g = cam_loc, ray_dirs
    st = (acc_s, acc_e, sdf_s, sdf_e, un_s, un_e, bk_s, bk_e, cur_s, cur_e)
    frames = []          # (sel, sel_ok, pre-stage acc_s/acc_e/un_s, width)
    overflow = jnp.zeros((), jnp.int32)

    for a, nxt, frac in zip(stages, boundaries, fracs):
        n_cur = st[4].shape[1]
        cap = min(max(int(math.ceil(n0 * frac)), 1), n_cur)
        active = st[4] | st[5]
        sel, sel_ok = _compact_mask(active, cap)                 # (B, cap)
        n_active = jnp.sum(active.astype(jnp.int32), axis=1)
        overflow = overflow + jnp.sum(jnp.maximum(n_active - cap, 0))
        frames.append((sel, sel_ok, st[0], st[1], st[4], n_cur))

        # ONE 16-wide row gather for the whole stage state (10 state
        # arrays + cam + dirs); separate same-index gathers cost ~2 ms
        # EACH per 262k rows on TPU (see _compact_gather)
        (acc_s_g, acc_e_g, sdf_s_g, sdf_e_g, un_s_g, un_e_g,
         bk_s_g, bk_e_g, cur_s_g, cur_e_g, cam_g, dirs_g) = \
            _compact_gather(sel, list(st) + [cam_g, dirs_g])
        un_s_in = un_s_g & sel_ok
        un_e_in = un_e_g & sel_ok
        # per-stage precision: a stage whose iterations end at or
        # before `coarse_trace_iters` runs the coarse fn (compaction
        # DURING the coarse phase), followed by a fine re-validation;
        # later stages run fine
        stage_coarse = p2_coarse or (
            sdf_fn_coarse is not None and nxt <= cfg.coarse_trace_iters)
        stepper = getattr(sdf_fn, "fused_trace_stepper", None)
        state_in = (acc_s_g, acc_e_g, sdf_s_g, sdf_e_g,
                    un_s_in, un_e_in,
                    bk_s_g, bk_e_g, cur_s_g, cur_e_g)
        if (cfg.trace_in_kernel and cfg.fused_backstep
                and not stage_coarse and stepper is not None):
            st = stepper(cam_g, dirs_g, state_in, nxt - a,
                         thr, cfg.line_search_step, cfg.line_step_iters,
                         cfg.trace_gate_end_front)
        else:
            run_c, _ = make_loop(cam_g, dirs_g, a, nxt,
                                 fn=sdf_fn_coarse if stage_coarse else None)
            c_state = run_c(state_in + (jnp.int32(a),))
            st = c_state[:10]
        if stage_coarse:
            # fine re-validation of this stage's fronts BEFORE the next
            # compaction selects on them: no ray may stay converged (or
            # get dropped) on a coarse value. Same rule as the
            # coarse->fine boundary; identity when coarse == fine
            # (recomputes the loop's own exit values — fronts are
            # stationary once stopped). Only rays that ENTERED this
            # stage unfinished can change state.
            _, fine_pair_g = make_loop(cam_g, dirs_g, 0, 0)
            f_s, f_e = fine_pair_g(st[0], st[1])
            ncx = st[0] < st[1]
            r_un_s = un_s_in & (((f_s > thr) & ncx) | (st[6] > 0))
            r_un_e = un_e_in & (((f_e > thr) & ncx) | (st[7] > 0))
            if cfg.trace_gate_end_front:
                r_un_e = r_un_e & (r_un_s | (st[7] > 0))
            st = (st[0], st[1], f_s, f_e, r_un_s, r_un_e) + st[6:]

    # unwind: scatter each stage's result back into its parent buffer
    # (ONE 3-wide scatter per stage — see _compact_gather's rationale)
    c_acc_s, c_acc_e, c_un_s = st[0], st[1], st[4]
    for sel, sel_ok, p_acc_s, p_acc_e, p_un_s, n_cur in reversed(frames):
        c_acc_s, c_acc_e, c_un_s = _masked_scatter_wide(
            (p_acc_s, p_acc_e, p_un_s), sel,
            (c_acc_s, c_acc_e, c_un_s), sel_ok)
    # overflow beyond capacity keeps its pre-stage state (still
    # unfinished -> handled by the dense sampler downstream); counted
    # per stage (top_k takes active rays first: active_count - cap)
    return c_acc_s, c_acc_e, c_un_s, overflow


def _dense_ray_sampler(sdf_fn: SDFFn, key, cam_loc, ray_dirs, object_mask,
                       t_lo, t_hi, sampler_mask, cfg: RayTracingConfig,
                       training: bool,
                       sdf_fn_coarse: Optional[SDFFn] = None):
    """Uniform n_steps sampling + first-sign-change pick + secant.

    Parity: RayTracing.ray_sampler (levelset_sampling.py:1034-1112).
    Full-width: evaluates every ray; `sampler_mask` only gates which
    results the caller takes. With `cfg.sampler_coarse` the n_steps
    sweep runs on the coarse fn and the secant bracket endpoints are
    re-evaluated fine (see RayTracingConfig).

    Returns (points, t, object_mask, overflow) — overflow is the count
    of presweep-flagged rays beyond the dense-buffer capacity (0 when
    the presweep is off).
    """
    n = cfg.n_steps
    use_coarse = cfg.sampler_coarse and sdf_fn_coarse is not None
    fn_dense = sdf_fn_coarse if use_coarse else sdf_fn

    if 2 <= cfg.sampler_presweep < n:
        return _presweep_sampler(sdf_fn, key, cam_loc, ray_dirs,
                                 object_mask, t_lo, t_hi, sampler_mask,
                                 cfg, training, sdf_fn_coarse)
    # hysteresis margin for the coarse first-sign-change pick: keeps
    # near-zero noise from minting false first crossings
    # (RayTracingConfig.sampler_coarse_margin) — the pick requires
    # f < −margin.
    margin = cfg.sampler_coarse_margin if use_coarse else 0.0
    fused = getattr(sdf_fn, "fused_ray_sampler", None)
    # the kernel's coarse sweep is the bf16-hi half of sdf_fn's own
    # pack, which equals sdf_fn_coarse ONLY for f32x3 packing — other
    # packings (stride 2) would silently sweep at fine precision, so
    # fall back to the XLA path there (advisor r3 finding).
    if fused is not None and use_coarse and \
            getattr(fused, "packing_stride", None) != 3:
        fused = None
    if cfg.sampler_in_kernel and fused is not None:
        # sweep + bracket re-validation + secant in ONE Pallas kernel
        # (ops/pallas_sampler.py); only the (B, N)-sized hit/fallback
        # selection below stays in XLA. See RayTracingConfig.
        # sampler_in_kernel for the sdf_fn_coarse contract.
        t_pick, f_pick, t_min, z_secant = fused(
            cam_loc, ray_dirs, t_lo, t_hi, jnp.linspace(0.0, 1.0, n),
            n_secant=cfg.n_secant_steps, margin=margin,
            coarse_sweep=use_coarse)
    else:
        steps = jnp.linspace(0.0, 1.0, n)
        ts = t_lo[..., None] + steps * (t_hi - t_lo)[..., None]    # (B,N,S)
        pts = cam_loc[..., None, :] + ts[..., None] * ray_dirs[..., None, :]
        sdf_val = _eval_sdf_chunked(fn_dense, pts,
                                    cfg.sampler_chunk_rays)        # (B,N,S)

        # first sign change: sign(f_i)·countdown argmin (reference
        # :1061-1063)
        countdown = jnp.arange(n, 0, -1, dtype=sdf_val.dtype)
        costs = jnp.sign(sdf_val + margin) * countdown
        idx = jnp.argmin(costs, axis=-1)                           # (B,N)

        pick = lambda a, i: jnp.take_along_axis(a, i[..., None],
                                                axis=-1)[..., 0]
        t_pick = pick(ts, idx)
        f_pick = pick(sdf_val, idx)

        # P_out pixels: minimal-SDF point on the ray
        idx_min = jnp.argmin(sdf_val, axis=-1)
        t_min = pick(ts, idx_min)

        # secant interval: [idx-1, idx]
        idx_lo = jnp.maximum(idx - 1, 0)
        z_low = pick(ts, idx_lo)
        f_low = pick(sdf_val, idx_lo)
        if use_coarse:
            # fine re-validation of the bracket: the hit decision and
            # the secant refinement must not rest on coarse values
            t2 = jnp.stack([z_low, t_pick], axis=-1)               # (B,N,2)
            p2 = cam_loc[..., None, :] + t2[..., None] * ray_dirs[..., None, :]
            f2 = sdf_fn(p2)
            f_low, f_pick = f2[..., 0], f2[..., 1]
        z_secant = _secant_scan(sdf_fn, f_low, f_pick, z_low, t_pick,
                                cam_loc, ray_dirs, cfg.n_secant_steps)
    net_surface = f_pick < 0

    secant_ok = net_surface & (object_mask if training else jnp.ones_like(net_surface))
    p_out = ~(object_mask & net_surface)
    t_out = jnp.where(secant_ok, z_secant, jnp.where(p_out, t_min, t_pick))
    pts_out = cam_loc + t_out[..., None] * ray_dirs
    obj_mask_out = sampler_mask & net_surface
    return pts_out, t_out, obj_mask_out, jnp.zeros((), jnp.int32)


def _presweep_sampler(sdf_fn: SDFFn, key, cam_loc, ray_dirs, object_mask,
                      t_lo, t_hi, sampler_mask, cfg: RayTracingConfig,
                      training: bool,
                      sdf_fn_coarse: Optional[SDFFn] = None):
    """Certify-then-sweep sampler (RayTracingConfig.sampler_presweep).

    Stage 1 evaluates `sampler_presweep` uniform steps per ray. A ray
    is CERTIFIED crossing-free when every interval [a, b] of the
    presweep grid has sign(f_a) == sign(f_b) and min(|f_a|, |f_b|) >
    lipschitz·(b − a) — sound for L-Lipschitz fields (true SDFs: L=1).
    Certified rays are non-surface and take their min-SDF point from
    the presweep grid (vs the n_steps grid — both are "a random-ish
    minimum", the reference's own fallback semantics). Flagged rays
    are top_k-compacted into a ceil(dense_fraction·width) buffer and
    swept densely with reference semantics; beyond-capacity rays are
    treated as non-surface and counted.
    """
    import dataclasses

    s1 = cfg.sampler_presweep
    use_coarse = cfg.sampler_coarse and sdf_fn_coarse is not None
    fn_dense = sdf_fn_coarse if use_coarse else sdf_fn

    steps1 = jnp.linspace(0.0, 1.0, s1)
    ts1 = t_lo[..., None] + steps1 * (t_hi - t_lo)[..., None]     # (B,N,S1)
    pts1 = cam_loc[..., None, :] + ts1[..., None] * ray_dirs[..., None, :]
    f1 = _eval_sdf_chunked(fn_dense, pts1, cfg.sampler_chunk_rays)

    seg = jnp.abs(t_hi - t_lo)[..., None] / max(s1 - 1, 1)
    fa, fb = f1[..., :-1], f1[..., 1:]
    lip = cfg.sampler_presweep_lipschitz
    possible = ((jnp.sign(fa) != jnp.sign(fb))
                | (jnp.minimum(jnp.abs(fa), jnp.abs(fb)) <= lip * seg))
    needs_dense = sampler_mask & jnp.any(possible, axis=-1)       # (B,N)

    # certified-ray fallback: min-SDF point on the presweep grid
    idx1 = jnp.argmin(f1, axis=-1)
    t_min1 = jnp.take_along_axis(ts1, idx1[..., None], axis=-1)[..., 0]

    b, nr = sampler_mask.shape
    cap = min(max(int(math.ceil(nr * cfg.sampler_dense_fraction)), 1), nr)
    sel, sel_ok = _compact_mask(needs_dense, cap)
    cam_g, dirs_g, om_g, tlo_g, thi_g = _compact_gather(
        sel, [cam_loc, ray_dirs, object_mask, t_lo, t_hi])

    cfg_dense = dataclasses.replace(cfg, sampler_presweep=0)
    d_pts, d_t, d_obj, _ = _dense_ray_sampler(
        sdf_fn, key, cam_g, dirs_g, om_g, tlo_g, thi_g,
        sel_ok, cfg_dense, training, sdf_fn_coarse=sdf_fn_coarse)

    t_out = t_min1                       # certified / overflow default
    obj_out = jnp.zeros_like(needs_dense)
    t_out, obj_out = _masked_scatter_wide(
        (t_out, obj_out), sel, (d_t, d_obj), sel_ok)
    obj_out = sampler_mask & obj_out

    n_flagged = jnp.sum(needs_dense.astype(jnp.int32), axis=1)
    overflow = jnp.sum(jnp.maximum(n_flagged - cap, 0))
    pts_out = cam_loc + t_out[..., None] * ray_dirs
    return pts_out, t_out, obj_out, overflow


def _minimal_sdf_points(sdf_fn: SDFFn, key, cam_loc, ray_dirs, t_lo, t_hi,
                        n_steps: int, chunk_rays: int = 0,
                        in_kernel: bool = False):
    """Random-stratified min-SDF point per ray
    (levelset_sampling.py:1135-1168). With `in_kernel` and a fused
    sdf_fn, the sweep+argmin runs inside the Pallas sampler kernel
    (the step fractions are just the random u instead of a linspace)."""
    u = jax.random.uniform(key, (n_steps,))
    fused = getattr(sdf_fn, "fused_ray_sampler", None)
    if in_kernel and fused is not None:
        _, _, t_min, _ = fused(cam_loc, ray_dirs, t_lo, t_hi, u,
                               n_secant=0, margin=0.0, coarse_sweep=False)
        return cam_loc + t_min[..., None] * ray_dirs, t_min
    ts = t_lo[..., None] + u * (t_hi - t_lo)[..., None]
    pts = cam_loc[..., None, :] + ts[..., None] * ray_dirs[..., None, :]
    sdf_val = _eval_sdf_chunked(sdf_fn, pts, chunk_rays)
    idx = jnp.argmin(sdf_val, axis=-1)
    t_min = jnp.take_along_axis(ts, idx[..., None], axis=-1)[..., 0]
    return cam_loc + t_min[..., None] * ray_dirs, t_min


def ray_trace(sdf_fn: SDFFn, cam_loc: jax.Array, ray_dirs: jax.Array,
              object_mask: jax.Array, key: jax.Array,
              cfg: RayTracingConfig = RayTracingConfig(),
              training: bool = True,
              sdf_fn_coarse: Optional[SDFFn] = None) -> RayTraceResult:
    """Full IDR ray tracing (RayTracing.forward, levelset_sampling.py:830-920).

    Pipeline: bounding-sphere interval → bidirectional sphere tracing →
    dense sampler + secant for unconverged rays → (training) min-SDF
    fallback points for mask-loss pixels.

    Args:
      cam_loc: (B, 1, 3) or (B, N, 3) camera centers.
      ray_dirs: (B, N, 3) unit directions.
      object_mask: (B, N) GT silhouette at each ray's pixel.
      key: PRNG key for the min-SDF random steps.
    """
    cam_loc = jnp.broadcast_to(cam_loc, ray_dirs.shape)
    near, far, mask_intersect = intersection_with_unit_sphere(
        cam_loc, ray_dirs, radius=cfg.object_bounding_sphere)
    # SIGNED depths (projection onto the ray): a camera inside the
    # sphere gets a negative near depth, keeping the full chord as the
    # trace interval (the reference keeps init_zdepth signed,
    # utils/__init__.py:521-529)
    t_near = jnp.sum((near - cam_loc) * ray_dirs, axis=-1)
    t_far = jnp.sum((far - cam_loc) * ray_dirs, axis=-1)

    acc_s, acc_e, unfinished, trace_overflow = _bidirectional_sphere_trace(
        sdf_fn, cam_loc, ray_dirs, mask_intersect, t_near, t_far, cfg,
        sdf_fn_coarse=sdf_fn_coarse)

    dists = jnp.where(mask_intersect, acc_s, 0.0)
    network_object_mask = (acc_s < acc_e) & mask_intersect

    sampler_mask = unfinished
    sampler_overflow = jnp.zeros((), jnp.int32)
    k1, k2 = jax.random.split(key)
    if cfg.sampler_fraction >= 1.0:
        s_pts, s_t, s_obj, ps_ovf = _dense_ray_sampler(
            sdf_fn, k1, cam_loc, ray_dirs, object_mask, acc_s, acc_e,
            sampler_mask, cfg, training, sdf_fn_coarse=sdf_fn_coarse)
        dists = jnp.where(sampler_mask, s_t, dists)
        network_object_mask = jnp.where(sampler_mask, s_obj,
                                        network_object_mask)
        sampler_overflow = sampler_overflow + ps_ovf
    else:
        # compact unconverged rays into a static buffer, sample only
        # those, scatter back (bounded dense-sampler work)
        b, n = sampler_mask.shape
        cap = max(int(math.ceil(n * cfg.sampler_fraction)), 1)
        sel, sel_ok = _compact_mask(sampler_mask, cap)          # (B, cap)
        cam_g, dirs_g, om_g, accs_g, acce_g = _compact_gather(
            sel, [cam_loc, ray_dirs, object_mask, acc_s, acc_e])
        s_pts, s_t, s_obj, ps_ovf = _dense_ray_sampler(
            sdf_fn, k1, cam_g, dirs_g, om_g, accs_g, acce_g,
            sel_ok, cfg, training, sdf_fn_coarse=sdf_fn_coarse)
        dists, network_object_mask = _masked_scatter_wide(
            (dists, network_object_mask), sel, (s_t, s_obj), sel_ok)
        # rays beyond capacity: treated as non-surface (rare overflow)
        overflow = sampler_mask & ~jax.vmap(
            lambda i, ok: jnp.zeros((n,), bool).at[
                jnp.where(ok, i, n)].set(True, mode="drop"))(sel, sel_ok)
        network_object_mask = jnp.where(overflow, False, network_object_mask)
        sampler_overflow = jnp.sum(overflow.astype(jnp.int32)) + ps_ovf

    points = cam_loc + dists[..., None] * ray_dirs

    if training:
        # rays needing a mask-loss witness point (in/out disagreement)
        in_mask = ~network_object_mask & object_mask & ~sampler_mask
        out_mask = ~object_mask & ~sampler_mask
        need = in_mask | out_mask

        # outside the bounding sphere: closest point to origin on the ray
        left_out = need & ~mask_intersect
        t_perp = -jnp.sum(ray_dirs * cam_loc, axis=-1)
        dists = jnp.where(left_out, t_perp, dists)

        # inside: random-stratified min-SDF point on the valid interval
        fix = need & mask_intersect
        t_lo = jnp.where(network_object_mask & out_mask, acc_s, t_near)
        m_pts, m_t = _minimal_sdf_points(sdf_fn, k2, cam_loc, ray_dirs,
                                         t_lo, t_far, cfg.n_steps,
                                         cfg.sampler_chunk_rays,
                                         in_kernel=cfg.sampler_in_kernel)
        dists = jnp.where(fix, m_t, dists)
        points = cam_loc + dists[..., None] * ray_dirs

    return RayTraceResult(points=points, dists=dists,
                          network_object_mask=network_object_mask,
                          mask_intersect=mask_intersect,
                          sampler_mask=sampler_mask,
                          trace_overflow=trace_overflow,
                          sampler_overflow=sampler_overflow)


# ---------------------------------------------------------------------------
# DVR zero crossing between point pairs (levelset_sampling.py:1210-1368)
# ---------------------------------------------------------------------------

def find_zero_crossing_between_point_pairs(
        sdf_fn: SDFFn, p0: jax.Array, p1: jax.Array,
        n_steps: int = 100, n_secant_steps: int = 8,
        is_occupancy: bool = False, allow_in_to_out: bool = False
        ) -> Tuple[jax.Array, jax.Array]:
    """First out→in zero crossing on each segment [p0, p1] + secant.

    SDF convention (`is_occupancy=False`): outside = f > 0; a valid
    crossing is pos→neg. Occupancy convention flips the comparison
    (reference :1235-1246).

    Returns (points (..., 3), mask (...,)); non-crossing segments keep
    ones (the reference's sanity fill, :1325-1327) under mask=False.
    """
    seg = p1 - p0
    seg_len = jnp.linalg.norm(seg, axis=-1)
    ray_dir = seg / jnp.maximum(seg_len[..., None], 1e-10)
    steps = jnp.linspace(0.0, 1.0, n_steps)
    ts = steps * seg_len[..., None]                                 # (..., S)
    pts = p0[..., None, :] + ts[..., None] * ray_dir[..., None, :]
    val = sdf_fn(pts)                                               # (..., S)

    outside = (val < 0.0) if is_occupancy else (val > 0.0)

    sign_mx = jnp.concatenate(
        [jnp.sign(val[..., :-1] * val[..., 1:]),
         jnp.ones_like(val[..., :1])], axis=-1)
    countdown = jnp.arange(n_steps, 0, -1, dtype=val.dtype)
    cost = sign_mx * countdown
    idx = jnp.argmin(cost, axis=-1)
    crossing = jnp.take_along_axis(cost, idx[..., None], axis=-1)[..., 0] < 0

    pick = lambda a, i: jnp.take_along_axis(a, i[..., None], axis=-1)[..., 0]
    f_start = pick(val, idx)
    out_to_in = (f_start < 0.0) if is_occupancy else (f_start > 0.0)
    mask = crossing if allow_in_to_out else (crossing & out_to_in)

    idx_hi = jnp.minimum(idx + 1, n_steps - 1)
    d_start, d_end = pick(ts, idx), pick(ts, idx_hi)
    f_end = pick(val, idx_hi)

    # the secant assumes the SDF sign convention (outside > 0); negate
    # for occupancy so the same update rule applies
    if is_occupancy:
        z = _secant_scan(lambda x: -sdf_fn(x), -f_start, -f_end,
                         d_start, d_end, p0, ray_dir, n_secant_steps)
    else:
        z = _secant_scan(sdf_fn, f_start, f_end, d_start, d_end, p0,
                         ray_dir, n_secant_steps)
    pt = p0 + z[..., None] * ray_dir
    pt = jnp.where(mask[..., None], pt, jnp.ones_like(pt))
    return pt, mask
