"""Config-driven factories.

Parity: reference config.py — `create_model` (:146, type
point|implicit|combined with dotted-string decoder lookup),
`create_dataset` (:135), `create_trainer` (:269), `create_renderer`
(:301), `create_lights` (:104). Consumes the AttrDict configs from
`isopoints_tpu.config` (schema: configs/default.yaml).
"""

from typing import Any, Dict, Optional

from isopoints_tpu.config import AttrDict
from isopoints_tpu.models.combined import CombinedConfig, CombinedModel
from isopoints_tpu.models.fields import RenderingNetwork, SDFField, SirenField
from isopoints_tpu.models.implicit import ImplicitConfig, ImplicitModel
from isopoints_tpu.models.point import PointModel, PointModelConfig
from isopoints_tpu.rendering.lighting import DirectionalLights, PointLights
from isopoints_tpu.rendering.rasterizer import RasterizationSettings
from isopoints_tpu.training.scheduler import TrainerScheduler
from isopoints_tpu.training.trainer import MVRTrainer, TrainerConfig
from isopoints_tpu.utils import get_class_from_string


def create_decoder(cfg: AttrDict):
    """Decoder from `model.decoder_type` (+ optional dotted path) and
    `model.decoder_kwargs` (config.py:164-203)."""
    dtype = cfg.model.get("decoder_type", "siren")
    kwargs = dict(cfg.model.get("decoder_kwargs", {}))
    if "." in dtype:
        return get_class_from_string(dtype)(**kwargs)
    if dtype == "siren":
        return SirenField(**kwargs)
    if dtype == "sdf":
        return SDFField(**kwargs)
    raise ValueError(f"unknown decoder_type {dtype}")


def create_raster_settings(cfg: AttrDict) -> RasterizationSettings:
    params = dict(cfg.get("renderer", {}).get("raster_params", {}))
    return RasterizationSettings(**params)


def create_lights(cfg: AttrDict):
    """(config.py:104-133)."""
    lcfg = cfg.get("lights", None)
    if not lcfg:
        return DirectionalLights.create()
    kwargs = {k: v for k, v in lcfg.items() if k != "type"}
    if lcfg.get("type", "directional") == "point":
        return PointLights.create(**kwargs)
    return DirectionalLights.create(**kwargs)


def create_model(cfg: AttrDict):
    """(config.py:146-249)."""
    mtype = cfg.model.get("type", "combined")
    if mtype == "point":
        # the point model has no implicit decoder/texture
        pcfg = PointModelConfig(**dict(cfg.model.get("point_kwargs", {})))
        return PointModel(pcfg, create_raster_settings(cfg))

    decoder = create_decoder(cfg)
    icfg = ImplicitConfig(**dict(cfg.model.get("implicit_kwargs", {})))
    rendering_net = None
    if icfg.texture_type == "neural":
        # no latent code feeds the texture net here (c_dim=0, matching
        # ImplicitModel's own default; NeuralTexture inputs are
        # [normals, points, embedded view], texture.py:137-156)
        tkw = {"dim": 9, "c_dim": 0}
        tkw.update(dict(cfg.model.get("texture_kwargs", {})))
        rendering_net = RenderingNetwork(**tkw)

    if mtype == "implicit":
        return ImplicitModel(decoder, rendering_net, icfg)
    if mtype == "combined":
        ccfg = CombinedConfig(**dict(cfg.model.get("combined_kwargs", {})))
        return CombinedModel(decoder, rendering_net, icfg, ccfg,
                             raster_settings=create_raster_settings(cfg))
    raise ValueError(f"unknown model type {mtype}")


def create_trainer(model, cfg: AttrDict, seed: int = 0,
                   n_devices: int = 1,
                   views_sharded: bool = False) -> MVRTrainer:
    """(config.py:269-299). `n_devices` > 1 shards rays over a device
    mesh (0 = all global devices); `views_sharded` enables the
    multi-host input mode (green-field multi-chip mandate,
    SURVEY.md §2.3, parallel/data.py)."""
    from isopoints_tpu.parallel.sharding import make_mesh

    tkw = dict(cfg.get("training", {}))
    sched_kw = {k[len("scheduler_"):]: v for k, v in tkw.items()
                if k.startswith("scheduler_")}
    tkw = {k: v for k, v in tkw.items() if not k.startswith("scheduler_")}
    tcfg = TrainerConfig(**{k: v for k, v in tkw.items()
                            if k in TrainerConfig.__dataclass_fields__})
    scheduler = TrainerScheduler(**sched_kw) if sched_kw else None
    return MVRTrainer(model, tcfg, scheduler=scheduler, seed=seed,
                      mesh=make_mesh(n_devices), views_sharded=views_sharded)


def create_dataset(cfg: AttrDict, mode: str = "train"):
    """(config.py:135-145): MVR directory, DTU directory, or synthetic."""
    dtype = cfg.data.get("type", "MVR")
    if dtype == "MVR":
        from isopoints_tpu.data.dataset import MVRDataset
        return MVRDataset(cfg.data.data_dir,
                          img_extension=cfg.data.get("img_extension", "png"))
    if dtype == "DTU":
        from isopoints_tpu.data.dataset import DTUDataset
        return DTUDataset(cfg.data.data_dir,
                          img_extension=cfg.data.get("img_extension", "png"))
    if dtype == "synthetic":
        from isopoints_tpu.data import synthetic
        sdf_name = cfg.data.get("sdf", "sphere")
        sdf_fn = {"sphere": synthetic.sphere_sdf,
                  "torus": synthetic.torus_sdf,
                  "box": synthetic.box_sdf}[sdf_name]()
        return synthetic.make_synthetic_mvr(
            sdf_fn,
            n_views=cfg.data.get("n_views", 24),
            image_size=cfg.data.get("image_size", 64),
            dist=cfg.data.get("camera_distance", 2.0),
            focal=cfg.data.get("focal_length", 2.0),
            seed=cfg.data.get("seed", 0))
    raise ValueError(f"unknown dataset type {dtype}")
