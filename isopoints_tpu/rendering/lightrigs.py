"""Light rigs and result animation helpers.

Parity: reference common.py — `get_tri_color_lights_for_view` (:45,
an RGB tri-light half-dome oriented by the camera view) and
`get_light_for_view` (:94 — broken in the reference: references
undefined `opt`/`math`/`point_lights`, SURVEY.md §5 defect 3; fixed
here as a single camera-oriented key light), `create_animation` (:9).
"""

import math
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from isopoints_tpu.core.camera import PerspectiveCamera
from isopoints_tpu.rendering.lighting import DirectionalLights, PointLights


def get_tri_color_lights_for_view(camera: PerspectiveCamera,
                                  has_specular: bool = False,
                                  point_lights: bool = False):
    """Three RGB directional (or point) lights on a half-dome around
    the view axis (common.py:45-92): elevations 30°, azimuths
    {-60°, 60°, 180°} in the camera frame.
    """
    b = camera.batch_size
    elev = math.radians(30.0)
    azims = [math.radians(a) for a in (-60.0, 60.0, 180.0)]
    dirs_cam = np.stack([
        [math.cos(elev) * math.sin(az), math.sin(elev),
         -math.cos(elev) * math.cos(az)] for az in azims
    ])                                                     # (3, 3) camera frame
    # rotate into world: row-vector d_world = d_cam @ R^T
    R = np.asarray(camera.R)                               # (B, 3, 3)
    dirs_world = np.einsum("ld,bdk->blk", dirs_cam, R.transpose(0, 2, 1))

    colors = np.eye(3, dtype=np.float32)[None].repeat(b, 0)  # R, G, B
    ambient = np.full((b, 3, 3), 0.2, np.float32)
    specular = (np.full((b, 3, 3), 0.2, np.float32) if has_specular
                else np.zeros((b, 3, 3), np.float32))
    if point_lights:
        # anchored at the SCENE center like the reference (common.py:85:
        # locations = light_directions * 5 from the origin), not at the
        # camera — a camera-anchored rim light would land in front of
        # the object
        return PointLights.create(ambient_color=ambient, diffuse_color=colors,
                                  specular_color=specular,
                                  location=dirs_world * 5.0)
    return DirectionalLights.create(ambient_color=ambient,
                                    diffuse_color=colors,
                                    specular_color=specular,
                                    direction=dirs_world)


def get_light_for_view(camera: PerspectiveCamera, has_specular: bool = True,
                       point_lights: bool = False):
    """Single white key light along the view direction, slightly
    elevated (fixed version of common.py:94-123)."""
    b = camera.batch_size
    elev = math.radians(20.0)
    d_cam = np.asarray([[0.0, math.sin(elev), -math.cos(elev)]])
    R = np.asarray(camera.R)
    dirs_world = np.einsum("ld,bdk->blk", d_cam, R.transpose(0, 2, 1))
    ambient = np.full((b, 1, 3), 0.3, np.float32)
    diffuse = np.full((b, 1, 3), 0.6, np.float32)
    specular = (np.full((b, 1, 3), 0.3, np.float32) if has_specular
                else np.zeros((b, 1, 3), np.float32))
    if point_lights:
        return PointLights.create(ambient_color=ambient, diffuse_color=diffuse,
                                  specular_color=specular,
                                  location=dirs_world * 5.0)
    return DirectionalLights.create(ambient_color=ambient,
                                    diffuse_color=diffuse,
                                    specular_color=specular,
                                    direction=dirs_world)


def create_animation(pts_dir: str, show_max: int = -1) -> None:
    """Collect saved point/mesh snapshots into slider-HTML animations
    (common.py:9-42): globs `*_iso.ply` and `*_mesh.ply` under
    `pts_dir` and writes pts_animation.html / mesh_animation.html."""
    import glob
    import os

    from isopoints_tpu.misc.visualize import animate_mesh, animate_points
    from isopoints_tpu.utils.io import read_ply

    iso_files = sorted(glob.glob(os.path.join(pts_dir, "*_iso.ply")))
    if show_max > 0:
        iso_files = iso_files[-show_max:]
    if iso_files:
        seqs = [read_ply(f)["points"] for f in iso_files]
        names = [os.path.basename(f) for f in iso_files]
        animate_points(seqs, os.path.join(pts_dir, "pts_animation.html"),
                       names=names)

    mesh_files = sorted(glob.glob(os.path.join(pts_dir, "*_mesh.ply")))
    if show_max > 0:
        mesh_files = mesh_files[-show_max:]
    meshes = [read_ply(f) for f in mesh_files]
    meshes = [m for m in meshes if "faces" in m]
    if meshes:
        animate_mesh([m["points"] for m in meshes],
                     [m["faces"] for m in meshes],
                     os.path.join(pts_dir, "mesh_animation.html"))
