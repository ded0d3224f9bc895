"""Per-point texturing: Phong shading and neural color fields.

Parity: reference DSS/core/texture.py — `LightingTexture` (:65) colors
points with multi-light Phong from their normals; `NeuralTexture`
(:130) runs a color decoder on [normals, points, embedded view dir].
Functional: both return per-point RGB features.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from isopoints_tpu.models.fields import RenderingNetwork
from isopoints_tpu.rendering.lighting import apply_lighting


def lighting_texture(points: jax.Array, normals: jax.Array, lights,
                     camera_position: jax.Array,
                     points_rgb: Optional[jax.Array] = None,
                     shininess: float = 64.0) -> jax.Array:
    """Phong-shaded per-point colors (LightingTexture.forward,
    texture.py:74-128): rgb·(ambient + diffuse) + specular."""
    if points_rgb is None:
        points_rgb = jnp.ones_like(points)
    ambient, diff, spec = apply_lighting(points, normals, lights,
                                         camera_position, shininess)
    return points_rgb * (ambient[:, None, :] + diff) + spec


def neural_texture(net: RenderingNetwork, params, points: jax.Array,
                   normals: jax.Array, view_dirs: jax.Array,
                   latent: Optional[jax.Array] = None) -> jax.Array:
    """Color decoder on [normals, points, embed(view)] (NeuralTexture,
    texture.py:130-162 / IDR RenderingNetwork common.py:313-366)."""
    out = net.apply_with_view(params, normals, points, view_dirs, c=latent)
    return out.rgb
