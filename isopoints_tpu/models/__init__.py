"""Model zoo: implicit fields, level-set sampling, scene models.

Parity: reference DSS/models/__init__.py:26-28 exposes Implicit/Point/
Combined models; here the scene models live in implicit.py / point.py /
combined.py and the fields in fields.py.
"""

from isopoints_tpu.models.fields import (
    FieldOutput,
    SirenField,
    SDFField,
    RenderingNetwork,
    OccupancyField,
    positional_embedder,
    approximate_gradient,
)
