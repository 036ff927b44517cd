"""Device mesh + sharded programs.

The reference has no distributed story at all (SURVEY.md §2: batch_size=1,
no DP/TP/PP).  Here scaling is first-class:

  - axis 'data'  : queries sharded across chips (DP) — the frames/sec axis
  - axis 'model' : reference-place (DB) axis of the output layer sharded (TP)
                   so the database can grow past one chip's appetite

Both live on one Mesh; collectives ride ICI.  The STDP update is
column-parallel in the output dimension (every weight-column update depends
only on that column's post-synaptic state), so the TP training step needs no
collective inside a layer — only an all-gather of the (tiny) feature
activations when the output layer consumes sharded feature spikes.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, data: Optional[int] = None) -> Mesh:
    """A ('data', 'model') mesh over the first n_devices devices.

    By default all devices go to the data axis (query DP) — the right layout
    for the ≥10k frames/s north star; pass `data` to split off model axis
    shards for a large place database.
    """
    devs = jax.devices()[: (n_devices or len(jax.devices()))]
    n = len(devs)
    data = data or n
    model = n // data
    return Mesh(np.array(devs).reshape(data, model), ("data", "model"))


def shard_queries(mesh: Mesh, arr: jax.Array) -> jax.Array:
    """Place a (Q, ...) batch with the query axis split across 'data'."""
    return jax.device_put(arr, NamedSharding(mesh, P("data")))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree onto every device of the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_output_axis(mesh: Mesh, arr: jax.Array, axis: int) -> jax.Array:
    """Shard the given axis across 'model' (e.g. w_out's place axis)."""
    spec = [None] * arr.ndim
    spec[axis] = "model"
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def sharded_spike_counts(params, intensities, u_thresh, min_v_mem=-1.0,
                         mesh: Optional[Mesh] = None):
    """Multi-chip data-parallel inference: queries sharded over 'data',
    params/threshold tensor replicated, one jitted program — XLA partitions
    the scan across the mesh and gathers the (Q, R) counts.

    Uses the XLA scan path (core.network.forward_counts): a Pallas custom
    call does not SPMD-partition automatically, while the scan path does.
    Pads the query axis to a device multiple and strips the padding after.
    """
    import jax.numpy as jnp

    from lens_tpu.core.network import forward_counts

    mesh = mesh or make_mesh()
    n_data = mesh.shape["data"]
    q = intensities.shape[0]
    intens = pad_to_multiple(np.asarray(intensities, np.float32), 0, n_data)
    with mesh:
        counts = forward_counts(
            replicate(mesh, params),
            shard_queries(mesh, jnp.asarray(intens)),
            replicate(mesh, jnp.asarray(u_thresh)),
            min_v_mem=min_v_mem,
        )
    return np.asarray(counts)[:q]


def pad_to_multiple(arr: np.ndarray, axis: int, multiple: int) -> np.ndarray:
    """Pad an axis up to a device-count multiple so sharding divides evenly."""
    size = arr.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths)
