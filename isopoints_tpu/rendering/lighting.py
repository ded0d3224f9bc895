"""Multi-source Phong lighting.

Parity: reference DSS/core/lighting.py — packed-friendly `diffuse`
(:10) / `specular` (:81) supporting L light sources per batch,
`DirectionalLights` (:176), `PointLights` (:234). Pytree dataclasses;
all math batched `(B, L, 3)` against point arrays `(B, P, 3)`.
"""

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp


def _unit(v, eps=1e-6):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def _as_bl3(v) -> jax.Array:
    """Broadcast (3,) | (L, 3) | (B, L, 3) to (B, L, 3)."""
    v = jnp.asarray(v, jnp.float32)
    if v.ndim == 1:
        v = v[None]
    if v.ndim == 2:
        v = v[None]
    return v


def diffuse(normals: jax.Array, color: jax.Array, direction: jax.Array
            ) -> jax.Array:
    """Lambertian sum over L light sources (lighting.py:10-79).

    Args:
      normals: (B, P, 3); color/direction: (B, L, 3), direction points
      TOWARD the light (pytorch3d convention).
    Returns (B, P, 3).
    """
    n = _unit(normals)[:, None]                  # (B, 1, P, 3)
    d = _unit(direction)[:, :, None]             # (B, L, 1, 3)
    angle = jax.nn.relu(jnp.sum(n * d, axis=-1))  # (B, L, P)
    return jnp.sum(color[:, :, None, :] * angle[..., None], axis=1)


def specular(points: jax.Array, normals: jax.Array, color: jax.Array,
             direction: jax.Array, camera_position: jax.Array,
             shininess: float = 64.0) -> jax.Array:
    """Phong specular sum over L sources (lighting.py:81-174)."""
    n = _unit(normals)[:, None]                  # (B, 1, P, 3)
    d = _unit(direction)[:, :, None]             # (B, L, 1, 3)
    cos_angle = jnp.sum(n * d, axis=-1)          # (B, L, P)
    reflect = 2.0 * cos_angle[..., None] * n - d
    view = _unit(camera_position[:, None, None, :] - points[:, None])
    alpha = jax.nn.relu(jnp.sum(view * reflect, axis=-1)) ** shininess
    alpha = jnp.where(cos_angle > 0, alpha, 0.0)
    return jnp.sum(color[:, :, None, :] * alpha[..., None], axis=1)


@flax.struct.dataclass
class DirectionalLights:
    """L directional sources per batch (lighting.py:176-233)."""
    ambient_color: jax.Array   # (B, L, 3)
    diffuse_color: jax.Array   # (B, L, 3)
    specular_color: jax.Array  # (B, L, 3)
    direction: jax.Array       # (B, L, 3) toward the light

    @classmethod
    def create(cls, ambient_color=((0.5, 0.5, 0.5),),
               diffuse_color=((0.3, 0.3, 0.3),),
               specular_color=((0.2, 0.2, 0.2),),
               direction=((0.0, 1.0, 0.0),)) -> "DirectionalLights":
        return cls(ambient_color=_as_bl3(ambient_color),
                   diffuse_color=_as_bl3(diffuse_color),
                   specular_color=_as_bl3(specular_color),
                   direction=_as_bl3(direction))

    def light_direction(self, points: jax.Array) -> jax.Array:
        """(B, L, 3), independent of points for directional lights."""
        return self.direction

    def ambient(self) -> jax.Array:
        """(B, 3) summed over sources (texture.py:47-52)."""
        return jnp.sum(self.ambient_color, axis=1)


@flax.struct.dataclass
class PointLights:
    """L point sources per batch (lighting.py:234-302)."""
    ambient_color: jax.Array   # (B, L, 3)
    diffuse_color: jax.Array   # (B, L, 3)
    specular_color: jax.Array  # (B, L, 3)
    location: jax.Array        # (B, L, 3)

    @classmethod
    def create(cls, ambient_color=((0.5, 0.5, 0.5),),
               diffuse_color=((0.3, 0.3, 0.3),),
               specular_color=((0.2, 0.2, 0.2),),
               location=((0.0, 1.0, 0.0),)) -> "PointLights":
        return cls(ambient_color=_as_bl3(ambient_color),
                   diffuse_color=_as_bl3(diffuse_color),
                   specular_color=_as_bl3(specular_color),
                   location=_as_bl3(location))

    def ambient(self) -> jax.Array:
        return jnp.sum(self.ambient_color, axis=1)


def apply_lighting(points: jax.Array, normals: jax.Array, lights,
                   camera_position: jax.Array, shininess: float = 64.0,
                   with_specular: bool = True):
    """(ambient (B,3), diffuse (B,P,3), specular (B,P,3)) — parity:
    DSS/core/texture.py:25-62 apply_lighting."""
    if isinstance(lights, PointLights):
        direction = lights.location[:, :, None, :] - points[:, None]
        # per-point directions: fold the point axis through the L axis
        n = _unit(normals)[:, None]
        d = _unit(direction)
        angle = jax.nn.relu(jnp.sum(n * d, axis=-1))
        diff = jnp.sum(lights.diffuse_color[:, :, None, :] * angle[..., None], axis=1)
        if with_specular:
            cos_angle = jnp.sum(n * d, axis=-1)
            reflect = 2.0 * cos_angle[..., None] * n - d
            view = _unit(camera_position[:, None, None, :] - points[:, None])
            alpha = jax.nn.relu(jnp.sum(view * reflect, axis=-1)) ** shininess
            alpha = jnp.where(cos_angle > 0, alpha, 0.0)
            spec = jnp.sum(lights.specular_color[:, :, None, :] * alpha[..., None], axis=1)
        else:
            spec = jnp.zeros_like(points)
        return lights.ambient(), diff, spec

    diff = diffuse(normals, lights.diffuse_color, lights.direction)
    if with_specular:
        spec = specular(points, normals, lights.specular_color,
                        lights.direction, camera_position, shininess)
    else:
        spec = jnp.zeros_like(points)
    return lights.ambient(), diff, spec
