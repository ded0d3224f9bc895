"""Image sampling and pixel enumeration.

Parity: reference DSS/utils/__init__.py — `get_tensor_values` (:325,
grid_sample lookup of images at NDC points) and `sample_patch_points`
(:266); plus the full-grid `arange_pixels` the reference trainer
imports but never ships (SURVEY.md §5 latent defect 1).

Conventions: images are (B, H, W, C) channels-last (TPU-friendly);
NDC follows the rasterizer/camera convention (+X left, +Y up, pixel
centers): x_ndc(col) = (W − 2·col − 1)/W.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def ndc_to_pix_coords(ndc_xy: jax.Array, image_size: Tuple[int, int]) -> jax.Array:
    """NDC (+X left, +Y up) -> float pixel coords (col, row)."""
    h, w = image_size
    col = (w - 1.0) / 2.0 - ndc_xy[..., 0] * w / 2.0
    row = (h - 1.0) / 2.0 - ndc_xy[..., 1] * h / 2.0
    return jnp.stack([col, row], axis=-1)


def pix_to_ndc_coords(pix_xy: jax.Array, image_size: Tuple[int, int]) -> jax.Array:
    """Float pixel coords (col, row) -> NDC (+X left, +Y up)."""
    h, w = image_size
    x = (w - 2.0 * pix_xy[..., 0] - 1.0) / w
    y = (h - 2.0 * pix_xy[..., 1] - 1.0) / h
    return jnp.stack([x, y], axis=-1)


def sample_image_at_ndc(img: jax.Array, ndc_xy: jax.Array,
                        mode: str = "bilinear") -> jax.Array:
    """Look up image values at NDC points (get_tensor_values parity).

    Args:
      img: (B, H, W, C); ndc_xy: (B, N, 2) in the +X-left/+Y-up NDC.
      mode: 'bilinear' | 'nearest'. Out-of-range coords are clamped
        (the reference clamps to [-1, 1] before grid_sample).
    Returns: (B, N, C).
    """
    b, h, w, c = img.shape
    pix = ndc_to_pix_coords(ndc_xy, (h, w))
    col = jnp.clip(pix[..., 0], 0.0, w - 1.0)
    row = jnp.clip(pix[..., 1], 0.0, h - 1.0)

    if mode == "nearest":
        ci = jnp.round(col).astype(jnp.int32)
        ri = jnp.round(row).astype(jnp.int32)
        return jax.vmap(lambda im, r, cc: im[r, cc])(img, ri, ci)

    c0 = jnp.floor(col).astype(jnp.int32)
    r0 = jnp.floor(row).astype(jnp.int32)
    c1 = jnp.minimum(c0 + 1, w - 1)
    r1 = jnp.minimum(r0 + 1, h - 1)
    wc = (col - c0)[..., None]
    wr = (row - r0)[..., None]

    def g(im, r, cc):
        return im[r, cc]
    v00 = jax.vmap(g)(img, r0, c0)
    v01 = jax.vmap(g)(img, r0, c1)
    v10 = jax.vmap(g)(img, r1, c0)
    v11 = jax.vmap(g)(img, r1, c1)
    top = v00 * (1 - wc) + v01 * wc
    bot = v10 * (1 - wc) + v11 * wc
    return top * (1 - wr) + bot * wr


def arange_pixels(image_size: Tuple[int, int], batch_size: int = 1
                  ) -> Tuple[jax.Array, jax.Array]:
    """Full-grid pixel enumeration.

    Returns (pix (B, H*W, 2) int (col, row), ndc (B, H*W, 2)).
    """
    h, w = image_size
    rr, cc = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    pix = jnp.stack([cc.reshape(-1), rr.reshape(-1)], axis=-1)
    ndc = pix_to_ndc_coords(pix.astype(jnp.float32), (h, w))
    tile = lambda x: jnp.tile(x[None], (batch_size, 1, 1))
    return tile(pix), tile(ndc)


def sample_random_pixels(key: jax.Array, n_points: int,
                         image_size: Tuple[int, int], batch_size: int = 1,
                         continuous: bool = True) -> jax.Array:
    """Random pixel sample in NDC (sample_patch_points parity,
    utils/__init__.py:266-321). Returns (B, n_points, 2)."""
    h, w = image_size
    if continuous:
        u = jax.random.uniform(key, (batch_size, n_points, 2))
        pix = u * jnp.asarray([w - 1.0, h - 1.0])
    else:
        k1, k2 = jax.random.split(key)
        pix = jnp.stack([
            jax.random.randint(k1, (batch_size, n_points), 0, w).astype(jnp.float32),
            jax.random.randint(k2, (batch_size, n_points), 0, h).astype(jnp.float32),
        ], axis=-1)
    return pix_to_ndc_coords(pix, (h, w))
