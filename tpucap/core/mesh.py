"""Device mesh and sharding helpers.

The reference is single-device (SURVEY.md §2.4); the rebuild's parallelism is
a 1-D ``("data",)`` mesh over all local TPU cores, with gradients reduced by
``psum`` inside ``shard_map`` (SURVEY.md §2.5). These helpers centralize mesh
creation so every train/decode entry point shards identically.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(n_devices: int | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """Build a 1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices but only {len(devices)} present"
        )
    return Mesh(np.asarray(devices[:n_devices]), (axis_name,))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put_global(x: np.ndarray, sharding: NamedSharding):
    """Place a host array under ``sharding``, multi-process aware.

    Single process: plain device_put. Multi-process (the mesh spans
    non-addressable devices): every process holds the same full logical
    array and builds only its addressable shards — the standard
    global-array construction for host-replicated data on a DCN mesh
    (jax.make_array_from_callback slices x by each shard's index)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(x.shape, sharding, lambda i: x[i])


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch axis sharded over
    data. Each process must pass the same full global batch (the
    multi-host contract: shard_for_host is for *work lists*; device
    batches are logically global and built per-shard here)."""

    def put(x):
        x = np.asarray(x)
        return _put_global(x, data_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(put, batch)


def shard_stacked_batch(mesh: Mesh, batch):
    """Place a pytree of (N, B, ...) host stacks of N batches with the
    SECOND (batch) axis sharded over data — the input layout of the
    multi-step train programs (``make_*_train_step(multi_steps=N)``),
    whose lax.scan walks the leading axis one batch per step."""

    def put(x):
        x = np.asarray(x)
        spec = P(None, DATA_AXIS, *([None] * (x.ndim - 2)))
        return _put_global(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree of host arrays over every device of the mesh
    (params/optimizer state on a multi-process mesh — uncommitted numpy
    inputs cannot cross a process boundary inside jit). Typed PRNG key
    leaves (TrainState.rng) are carried via their raw key data and
    re-wrapped, since numpy cannot hold the extended dtype."""
    sharding = replicated_sharding(mesh)

    def put(x):
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key
        ):
            raw = np.asarray(jax.random.key_data(x))
            impl = str(jax.random.key_impl(x))
            return jax.random.wrap_key_data(
                _put_global(raw, sharding), impl=impl
            )
        return _put_global(np.asarray(x), sharding)

    return jax.tree_util.tree_map(put, tree)


def pad_to_multiple(batch_size: int, n_devices: int) -> int:
    """Smallest batch >= batch_size divisible by the mesh size."""
    return ((batch_size + n_devices - 1) // n_devices) * n_devices


def pad_rows(arr, target: int):
    """Zero-pad the leading (batch) axis up to ``target`` rows — the
    static-shape tail-batch idiom shared by every batched entry point
    (one compiled program per shape; callers trim results back to the
    true row count). No-op at size; numpy in -> numpy out."""
    n = arr.shape[0]
    if n == target:
        return arr
    if n > target:
        raise ValueError(f"batch has {n} rows, larger than target {target}")
    widths = [(0, target - n)] + [(0, 0)] * (arr.ndim - 1)
    if isinstance(arr, np.ndarray):
        return np.pad(arr, widths)
    import jax.numpy as jnp

    return jnp.pad(arr, widths)
