"""Multi-tenant LoRA adapters for serving.

The reference serves exactly one fine-tune at a time (peft adapters are
merged into the model at load,
/root/reference/src/clip_whisper/models/clip_whisper_model.py:949-1019).
Production AVSR serving wants S-LoRA/Punica-style multi-tenancy instead:
ONE resident base model, K cheap LoRA adapters, and every request picks
its adapter — mixed freely within a decode batch.

TPU-native representation: an *adapter* is the LLM params tree filtered
down to its ``{"lora": {"a", "b"}}`` leaves (structure preserved, so no
name mangling or path strings); a *bank* stacks K adapters leaf-wise to
``[K, ...]`` device arrays. Per-request selection is then a plain gather
``bank[a][ids]`` inside the jitted prefill/decode calls — one XLA gather
per leaf, trivially fused, no retracing per tenant mix — and
:func:`inject_lora` grafts the gathered ``[B, din, r]`` leaves into the
base tree, where ``models.llama.proj`` applies them row-batched. Per-row
numerics stay independent of the other rows, so the engine's
token-exactness contract extends per tenant (tests/test_engine.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from avsr_tpu.models.layers import Params


def extract_lora(llm: Params) -> Params:
    """Filter an LLM params tree down to its LoRA leaves.

    Returns the same dict/list nesting with only ``{"lora": {"a", "b"}}``
    subtrees kept (list positions are preserved with ``None`` placeholders
    so layer indices stay aligned for :func:`inject_lora`). Raises if the
    tree carries no LoRA at all — e.g. a merged decode tree, which cannot
    anchor an adapter bank."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "lora" and isinstance(v, dict) and "a" in v:
                    out[k] = {"a": v["a"], "b": v["b"]}
                elif isinstance(v, (dict, list)):
                    sub = walk(v)
                    if sub is not None:
                        out[k] = sub
            return out or None
        if isinstance(node, list):
            subs = [walk(v) for v in node]
            return subs if any(s is not None for s in subs) else None
        return None

    tree = walk(llm)
    if tree is None:
        raise ValueError(
            "params carry no lora leaves (merged or lora-free tree) — "
            "multi-adapter serving needs the unmerged base "
            "(model.lora.use_lora=true, init/convert without merge_lora)")
    return tree


def random_adapter_like(adapter: Params, key: jax.Array,
                        std: float = 0.02) -> Params:
    """A random adapter (testing/benchmarks: makes every bank row bite)."""
    leaves, treedef = jax.tree.flatten(adapter)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(
        treedef, [std * jax.random.normal(k, x.shape, x.dtype)
                  for k, x in zip(keys, leaves)])


def stack_lora_bank(adapters: list[Params]) -> Params:
    """K structure-identical adapters -> one bank with ``[K, ...]`` leaves.

    All adapters must share the base model's LoRA geometry (same r — the
    stack itself enforces shape agreement loudly)."""
    if not adapters:
        raise ValueError("adapter bank needs at least one adapter")
    return jax.tree.map(lambda *xs: jnp.stack(xs), *adapters)


def bank_size(bank: Params) -> int:
    return int(jax.tree.leaves(bank)[0].shape[0])


def select_lora(bank: Params, ids: jax.Array) -> Params:
    """Gather per-row adapters: ``[K, ...]`` bank + ``[B]`` ids ->
    ``[B, ...]`` leaves. Runs under jit (one fused gather per leaf)."""
    return jax.tree.map(lambda x: x[ids], bank)


def inject_lora(llm: Params, sel: Params | None) -> Params:
    """Graft (possibly row-batched) LoRA subtrees onto a base LLM tree.

    ``sel`` mirrors :func:`extract_lora`'s structure; wherever it holds a
    ``lora`` entry the returned tree carries it (replacing any resident
    adapter). Pure trace-time tree surgery — no copies of base weights."""
    if sel is None:
        return llm

    def walk(p, s):
        if s is None:
            return p
        if isinstance(p, dict):
            out = dict(p)
            for k, sv in s.items():
                out[k] = sv if k == "lora" else walk(p[k], sv)
            return out
        if isinstance(p, list):
            if len(s) != len(p):
                raise ValueError(
                    f"adapter layer count {len(s)} != model's {len(p)} "
                    "(adapter extracted from a different config?)")
            return [walk(pv, sv) for pv, sv in zip(p, s)]
        return p

    return walk(llm, sel)
