"""GPipe-style pipeline parallelism over a ``pp`` mesh axis.

The last parallelism axis from SURVEY.md §2.4/§7 ("optional PP across ICI
for very large LLMs"). SPMD formulation under shard_map:

  * layer params are stacked [S, Lps, ...] and sharded over ``pp`` — each
    device holds one stage of ``Lps`` layers;
  * microbatches enter stage 0 one per tick; activations ``ppermute`` to
    the next stage each tick; after S + M - 1 ticks every microbatch has
    crossed every stage (the classic GPipe schedule, bubble fraction
    (S-1)/(S+M-1));
  * the final stage's outputs are returned to every device with one
    ``psum`` over ``pp`` (non-final stages contribute zeros).

Everything is plain JAX (unrolled tick loop + ppermute + masking), so
reverse-mode AD derives the backward pipeline automatically — the ppermute
transposes into the reverse rotation, giving the standard backward-flow
schedule with no hand-written adjoints.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_apply(
    stage_fn: Callable,
    stage_params,
    x: jax.Array,
    *aux,
    mesh: Mesh,
    axis: str = "pp",
    microbatches: int | None = None,
) -> jax.Array:
    """Run ``x`` through S pipeline stages of ``stage_fn``.

    stage_fn(params_slice, x_mb, *aux_mb) -> y_mb applies ONE stage's layers
    to one microbatch (shapes [mb, ...]). ``stage_params``: pytree with a
    leading stage axis [S, ...] (sharded over ``axis``). x: [B, ...] global;
    B must divide into ``microbatches`` equal microbatches (default: S).
    ``aux``: per-sample side inputs [B, ...] threaded to every stage
    (e.g. valid lengths, RoPE positions).
    """
    S = mesh.shape[axis]
    B = x.shape[0]
    M = microbatches or S
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible by microbatches {M}")
    mb = B // M

    def local(params, x, *aux):
        # params: [1, ...] this device's stage slice; x: full [B, ...]
        params = jax.tree_util.tree_map(lambda p: p[0], params)
        stage = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % S) for i in range(S)]

        xs = x.reshape(M, mb, *x.shape[1:])
        auxs = [a.reshape(M, mb, *a.shape[1:]) for a in aux]
        carry = jnp.zeros((mb,) + x.shape[1:], x.dtype)   # in-flight act
        out = jnp.zeros_like(xs)                          # filled on last stage
        # aux for the microbatch currently resident on this device
        aux_carry = [jnp.zeros((mb,) + a.shape[1:], a.dtype) for a in aux]

        for t in range(S + M - 1):
            # stage 0 ingests microbatch t (clamped; masked out when t >= M)
            feed = xs[min(t, M - 1)]
            feed_aux = [a[min(t, M - 1)] for a in auxs]
            inp = jnp.where(stage == 0, feed, carry)
            cur_aux = [jnp.where(stage == 0, fa, ac)
                       for fa, ac in zip(feed_aux, aux_carry)]
            y = stage_fn(params, inp, *cur_aux)
            # microbatch id resident on this device at tick t
            m_id = t - stage
            valid = (m_id == jnp.clip(m_id, 0, M - 1)) & (stage == S - 1)
            slot = jnp.clip(m_id, 0, M - 1)
            contrib = jnp.where(valid, y, 0.0)
            out = out.at[slot].add(contrib.astype(out.dtype))
            if t + 1 < S + M - 1:
                carry = jax.lax.ppermute(y, axis, perm)
                aux_carry = [jax.lax.ppermute(ca, axis, perm)
                             for ca in cur_aux]
        # only the last stage holds real outputs; broadcast to all
        out = jax.lax.psum(out, axis)
        return out.reshape(B, *x.shape[1:])

    pspec = jax.tree_util.tree_map(lambda _: P(axis), stage_params)
    rep = P()
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(pspec, rep) + (rep,) * len(aux),
        out_specs=rep,
        check_vma=False,
    )(stage_params, x, *aux)


def stack_stages(layer_params: list, n_stages: int):
    """[L] list of per-layer pytrees -> stacked pytree [S, L/S, ...]."""
    L = len(layer_params)
    if L % n_stages != 0:
        raise ValueError(f"{L} layers not divisible by pp={n_stages}")
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *layer_params)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(n_stages, L // n_stages, *x.shape[1:]), stacked)
