"""Multi-host (pod-slice) data feeding.

The reference is a single Python process on one GPU (SURVEY.md §2.4), so it
has no notion of this problem. On a real TPU pod slice, JAX runs **one
process per host**, each seeing only its local chips: a global batch array
must be assembled from *process-local* shards — no host ever materializes
the whole batch. The production pattern (the one MaxText-style trainers
use) is:

  1. every process loads a disjoint slice of each global batch
     (``DataLoader(data_shard=(jax.process_index(), jax.process_count()))``
     — same deterministic shuffle everywhere, contiguous row ranges per
     host, manifest-metadata bucket agreement so all hosts pick the same
     static shape without seeing each other's samples);
  2. ``put_global`` / ``multihost_batch_sharder`` turn each local numpy
     shard into a global ``jax.Array`` via
     ``jax.make_array_from_process_local_data`` — the device layout comes
     from the same NamedSharding specs the single-host path uses, so the
     train step is byte-identical either way.

Under ``jax.process_count() == 1`` every function here degrades to the
plain ``device_put`` path, which is how the 8-device virtual-mesh tests
verify numerics: the local-shard selection logic and the assembled global
arrays must match the single-host loader exactly.
"""

from __future__ import annotations

import logging
from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger("avsr.mesh.multihost")

# The mesh axes a batch dimension shards over (mesh.sharding.batch_sharder
# uses the same tuple; ep counts as a data axis for every dense op).
DATA_AXES = ("dcn", "dp", "fsdp", "ep")


def process_shard() -> tuple[int, int]:
    """(process_index, process_count) — the loader's ``data_shard``."""
    return jax.process_index(), jax.process_count()


def data_parallel_ways(mesh: Mesh) -> int:
    ways = 1
    for ax in DATA_AXES:
        ways *= dict(mesh.shape).get(ax, 1)
    return ways


def put_global(x: Any, mesh: Mesh, spec: P) -> jax.Array:
    """Process-local numpy shard -> global jax.Array.

    Single-process: plain ``device_put`` (identical semantics, zero copies
    beyond the transfer). Multi-process: ``make_array_from_process_local_data``
    stitches each host's rows into the global array; replicated specs
    require identical data on every host (true for all our replicated batch
    leaves — they are derived from shared config, not samples)."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def multihost_batch_sharder(mesh: Mesh) -> Callable[[Any], Any]:
    """Train-batch sharder for process-local host batches.

    Mirrors ``mesh.sharding.batch_sharder`` — leaves are
    ``[accum, micro_local, ...]`` with the micro axis sharded over the data
    axes — but accepts each process's slice of the batch (micro_local =
    micro_global / process_count) and assembles the global array. The
    returned arrays carry exactly the NamedShardings the jitted train step
    expects, so pjit's collective insertion is unchanged."""
    def put(x):
        if not hasattr(x, "ndim") or x.ndim < 2:
            return put_global(x, mesh, P())
        return put_global(x, mesh, P(None, DATA_AXES))

    def shard(batch):
        return jax.tree_util.tree_map(put, batch)

    return shard


def multihost_infer_batch_sharder(mesh: Mesh) -> Callable[[Any], Any]:
    """Inference-batch analog (``[B_local, ...]`` leaves, no accum axis)."""
    ways = data_parallel_ways(mesh)
    local_ways = max(ways // jax.process_count(), 1)

    def put(x):
        if (not hasattr(x, "ndim") or x.ndim < 1
                or x.shape[0] % local_ways != 0):
            if ways > 1 and hasattr(x, "ndim") and x.ndim >= 2:
                log.warning(
                    "infer batch leaf %s does not divide the %d local "
                    "data-parallel ways — replicating it.",
                    tuple(getattr(x, "shape", ())), local_ways)
            return put_global(x, mesh, P())
        return put_global(x, mesh, P(DATA_AXES))

    def shard(batch):
        return jax.tree_util.tree_map(put, batch)

    return shard


def local_rows(batch_size: int, shard: tuple[int, int]) -> tuple[int, int]:
    """[lo, hi) rows of a global batch owned by process ``shard[0]`` of
    ``shard[1]``. Contiguous ranges: process p's rows line up with the
    mesh positions of its chips under the standard enumeration, and the
    union over processes is exactly [0, batch_size)."""
    idx, count = shard
    if not 0 <= idx < count:
        raise ValueError(f"data_shard index {idx} not in [0, {count})")
    if batch_size % count != 0:
        raise ValueError(
            f"global batch size {batch_size} must divide the "
            f"{count} data-loading processes")
    per = batch_size // count
    return idx * per, (idx + 1) * per
