"""Shared mixture-of-experts routing: GShard capacity dispatch as einsums.

Used by both the MoE connector (models/connectors.py, gelu experts) and
the MoE LLM FFN layers (models/llama.py, SwiGLU experts). The design rule
is TPU-first: top-k routing with a STATIC per-expert capacity, so the
whole dispatch is dense one-hot algebra — every op an MXU-tileable einsum,
no scatters, no dynamic shapes, no host sync. Tokens past capacity drop to
the residual path (standard GShard overflow semantics).

Expert weights are stacked [E, ...] and shard over the mesh "ep" axis
(mesh/sharding.py rules); with the batch also sharded over ep, XLA's SPMD
partitioner lowers the dispatch/combine einsums to the classic all-to-all
exchange.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def capacity(n_tokens: int, n_experts: int, topk: int,
             factor: float) -> int:
    """Static per-expert slot count, rounded up to a lane-friendly
    multiple of 8. Computed from trace-time shapes — jit-safe."""
    c = int(math.ceil(topk * n_tokens * factor / n_experts))
    return max(8, (c + 7) // 8 * 8)


def capacity_dyn(n_valid: jax.Array, n_experts: int, topk: int,
                 factor: float) -> jax.Array:
    """Traced-scalar twin of :func:`capacity` computed from a row's VALID
    token count instead of its padded width. Row-wise inference routing
    (``rowwise`` in models.llama._moe_mlp / models.connectors._moe_block)
    uses this as the effective slot cutoff so a request's drop pattern
    depends only on its own length — never on the bucket it was padded
    to or on what else shares the staged batch. Monotone in ``n_valid``,
    so it is always <= the static ``capacity(T, ...)`` slot dim."""
    c = jnp.ceil(topk * n_valid.astype(jnp.float32) * factor
                 / n_experts).astype(jnp.int32)
    return jnp.maximum(8, (c + 7) // 8 * 8)


def dropless_capacity(n_tokens: int, topk: int) -> int:
    """C >= topk*N: no token can overflow any expert, so routing becomes
    composition-independent — a token's output depends only on its own
    hidden state, never on what else shares the call. The TOKEN-STEP
    inference paths use this (N is small there: a decode step routes B
    tokens, a speculative verify B*(gamma+1)); prefill paths instead use
    per-row routing (vmapped :func:`route` + :func:`dispatch_apply_rowwise`
    — dropless capacity would be O(topk*N^2*E) dispatch there, ~GBs at
    staging width). Together they make the token-exactness contracts
    (speculative==greedy, engine==generate_tokens) composition-independent
    for MoE models. Training keeps the bounded flattened ``capacity``
    above (standard GShard efficiency trade)."""
    return max(8, (topk * n_tokens + 7) // 8 * 8)


def dispatch_apply_rowwise(dispatch: jax.Array, combine: jax.Array,
                           x: jax.Array, expert_fn, mesh=None) -> jax.Array:
    """Row-wise dispatch->experts->combine: dispatch/combine [B, T, E, C]
    from per-row :func:`route` (vmapped), x [B, T, d]. Each sequence owns
    its capacity slots, so its routing outcome is independent of what
    else shares the call — the inference-prefill counterpart of
    :func:`dispatch_apply` (see ``rowwise`` in models.llama._moe_mlp).
    Experts still run as ONE stacked matmul over [E, B*C, d]."""
    B, T, E, C = dispatch.shape
    d = x.shape[-1]
    cdt = x.dtype
    xs = jnp.einsum("btec,btd->becd", dispatch.astype(cdt), x)
    xs = constrain_ep(xs.transpose(1, 0, 2, 3).reshape(E, B * C, d), mesh)
    ys = expert_fn(xs)
    ys = ys.reshape(E, B, C, -1).transpose(1, 0, 2, 3)     # [B, E, C, d']
    return jnp.einsum("btec,becd->btd", combine.astype(cdt), ys)


def dispatch_apply(dispatch: jax.Array, combine: jax.Array,
                   xf: jax.Array, expert_fn, mesh=None) -> jax.Array:
    """Shared dispatch->experts->combine scaffolding.

    dispatch/combine [N, E, C] from :func:`route`; xf [N, d];
    ``expert_fn([E, C, d]) -> [E, C, d']`` supplies the expert math
    (gelu 2-matrix for the connector, SwiGLU for the LLM). Returns
    [N, d']."""
    cdt = xf.dtype
    xs = jnp.einsum("nec,nd->ecd", dispatch.astype(cdt), xf)
    xs = constrain_ep(xs, mesh)
    ys = expert_fn(xs)
    return jnp.einsum("nec,ecd->nd", combine.astype(cdt), ys)


def route(logits: jax.Array, valid: jax.Array, topk: int, C: int,
          cap: jax.Array | None = None
          ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Capacity-routed top-k dispatch from router logits.

    logits [N, E] (fp32), valid [N] float (0 masks padding out of routing
    and the aux losses). Returns
      dispatch [N, E, C]  one-hot token->slot assignment
      combine  [N, E, C]  dispatch * renormalized gate weight
      lb                  Switch load-balance loss (1.0 at uniform)
      z                   router z-loss
    Priority is slot-major: every token's 1st choice claims capacity
    before any token's 2nd choice.

    ``cap`` (optional traced int scalar <= C, e.g. :func:`capacity_dyn`)
    tightens the overflow cutoff below the static slot dim C without
    changing any shape — row-wise inference routing passes the row's
    valid-length capacity here so drops are padding-independent.
    """
    N, E = logits.shape
    cutoff = C if cap is None else cap
    probs = jax.nn.softmax(logits, axis=-1)                      # [N, E]
    gate_v, gate_i = jax.lax.top_k(probs, topk)                  # [N, k]
    gate_v = gate_v / jnp.maximum(gate_v.sum(-1, keepdims=True), 1e-9)
    gate_v = gate_v * valid[:, None]                             # pad -> 0

    se = jax.nn.one_hot(gate_i, E, dtype=jnp.float32) * valid[:, None, None]
    se_f = se.transpose(1, 0, 2).reshape(topk * N, E)            # [kN, E]
    pos_e = jnp.cumsum(se_f, axis=0) - se_f                      # [kN, E]
    pos = jnp.sum(pos_e * se_f, axis=-1)                         # [kN]
    in_cap = (pos < cutoff).astype(jnp.float32)
    slot = jnp.where(pos < cutoff, pos, 0).astype(jnp.int32)
    oh_c = jax.nn.one_hot(slot, C, dtype=jnp.float32) * in_cap[:, None]
    disp_f = se_f[:, :, None] * oh_c[:, None, :]                 # [kN, E, C]
    gate_f = gate_v.T.reshape(topk * N)
    comb_f = disp_f * gate_f[:, None, None]
    dispatch = disp_f.reshape(topk, N, E, C).sum(0)              # [N, E, C]
    combine = comb_f.reshape(topk, N, E, C).sum(0)               # [N, E, C]

    # Switch-style load-balance loss on valid tokens: E * sum_e f_e * P_e
    # (== 1.0 at perfectly uniform routing), plus router z-loss.
    nvalid = jnp.maximum(valid.sum(), 1.0)
    f_e = jnp.sum(se[:, 0, :], axis=0) / nvalid                  # top-1 frac
    p_e = jnp.sum(probs * valid[:, None], axis=0) / nvalid
    lb = E * jnp.sum(f_e * p_e)
    z = jnp.sum(jax.nn.logsumexp(logits, axis=-1) ** 2 * valid) / nvalid
    return dispatch, combine, lb, z


def constrain_ep(x: jax.Array, mesh) -> jax.Array:
    """Pin the expert-stacked activation [E, C, d] to the ep axis so the
    partitioner keeps expert compute local and exchanges tokens instead."""
    if mesh is not None and dict(mesh.shape).get("ep", 1) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("ep", None, None)))
    return x
