"""Multi-host input pipeline (the DCN side of the scaling design).

The reference is single-process (SURVEY.md §2.3) — this is green-field
per BASELINE.md config 5 ("multi-host data loading over DCN"). Design:

* The per-step global view batch (images + masks + cameras) is
  partitioned across HOSTS: each process loads only its
  `B_global / process_count` views from disk and contributes them as
  the process-local shard of a global array whose batch axis is
  sharded over the `data` mesh axis
  (`jax.make_array_from_process_local_data`). Host->device traffic is
  therefore 1/process_count of the batch per host.
* Inside the train step (`sharding.make_train_step(views_sharded=True)`)
  the batch-sharded views are `all_gather`ed over ICI — cheap (a few
  MB of images) and far faster than every host reading + shipping the
  full batch over PCIe/DCN.
* Ray sharding happens after the gather exactly as in the replicated
  path, so the two input modes are numerically identical
  (tests/test_parallel.py::test_views_sharded_matches_replicated).

Single-process (`jax.process_count() == 1`, incl. the virtual CPU
mesh) degenerates to a plain `device_put` with the same sharding, so
every code path here is exercised in CI.
"""

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_view_indices(global_indices: Sequence[int],
                       process_index: Optional[int] = None,
                       process_count: Optional[int] = None) -> np.ndarray:
    """The contiguous slice of a global per-step view-index batch that
    THIS host must load from disk.

    `len(global_indices)` must divide evenly by the process count (pad
    the batch when sampling it — the driver samples the global batch
    deterministically from a shared seed so all hosts agree on it).
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    idx = np.asarray(global_indices)
    if idx.shape[0] % pc != 0:
        raise ValueError(
            f"global batch {idx.shape[0]} not divisible by {pc} hosts")
    per = idx.shape[0] // pc
    return idx[pi * per:(pi + 1) * per]


def form_global_batch(local_tree: Any, mesh: Mesh,
                      axis_name: str = "data") -> Any:
    """Assemble process-local view shards into a global batch-sharded
    pytree on `mesh` (batch axis split over `axis_name`).

    Multi-process: `jax.make_array_from_process_local_data` (no
    cross-host data movement — each host's shard goes straight to its
    local devices). Single-process: `device_put` with the identical
    sharding, so tests exercise the same layout.
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def place(x):
        x = np.asarray(x)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree.map(place, local_tree)


def sample_global_view_batch(key: jax.Array, n_views: int,
                             global_batch: int) -> np.ndarray:
    """Deterministic global view-index sample all hosts agree on
    (every host holds the same replicated key; no communication).
    Without replacement when the batch fits in the dataset, so hosts
    never load the same view twice in one step."""
    if global_batch <= n_views:
        idx = jax.random.choice(key, n_views, (global_batch,),
                                replace=False)
    else:
        idx = jax.random.randint(key, (global_batch,), 0, n_views)
    return np.asarray(jax.device_get(idx))


class HostShardedViews:
    """Iterator over host-local view batches for a map-style dataset.

    `dataset[i]` must return `(img_hwc, mask_hw1, camera_row)` numpy
    entries; each step yields (local_indices, stacked local arrays)
    ready for `form_global_batch`.
    """

    def __init__(self, dataset, global_batch: int, seed: int = 0,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.dataset = dataset
        self.global_batch = int(global_batch)
        self.key = jax.random.key(seed)
        self.process_index = process_index
        self.process_count = process_count

    def next_local(self):
        self.key, k = jax.random.split(self.key)
        gidx = sample_global_view_batch(k, len(self.dataset),
                                        self.global_batch)
        lidx = local_view_indices(gidx, self.process_index,
                                  self.process_count)
        items = [self.dataset[int(i)] for i in lidx]
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *items)
        return lidx, stacked
