"""Weight-only int8/int4 quantization — the TPU-native ``use_4bit``.

The reference quantizes the LLM with bitsandbytes nf4
(clip_whisper_model.py:913-928); there is no BnB on TPU, so the equivalent
is XLA-native weight-only quantization (SURVEY.md §7 hard parts): symmetric
per-output-channel int8 (or int4) storage with on-the-fly dequantization
fused into the matmul by XLA — HBM footprint and bandwidth drop 2x/4x while
the MXU still sees bf16 operands.

A quantized linear is the pytree {"qw": int8[in,out], "scale": f32[out]}
(int4 packs two nibbles per int8 byte: int8[in//2, out]); ``qdot`` computes
x @ dequant(qw). ``quantize_llm`` rewrites a Llama param tree in place —
LoRA adapters stay f32/bf16 on top of the frozen quantized base, matching
the reference's QLoRA-style training recipe.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Quantize / dequantize
# ---------------------------------------------------------------------------

def quantize_tensor(w: jax.Array, bits: int = 8) -> Params:
    """Symmetric per-output-channel quantization of w [in, out]."""
    w = w.astype(jnp.float32)
    qmax = 127.0 if bits == 8 else 7.0
    scale = jnp.max(jnp.abs(w), axis=0) / qmax          # [out]
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w / scale[None, :]), -qmax, qmax).astype(jnp.int8)
    if bits == 4:
        if q.shape[0] % 2:
            raise ValueError(f"int4 needs even in-dim, got {q.shape}")
        lo = q[0::2] & 0x0F                              # low nibble
        hi = (q[1::2] & 0x0F) << 4
        packed = (lo | hi).astype(jnp.int8)              # [in//2, out]
        # bit width is encoded in the key name ("qw4" vs "qw") so the pytree
        # holds arrays only — an int leaf would turn into a tracer under jit.
        return {"qw4": packed, "scale": scale.astype(jnp.float32)}
    return {"qw": q, "scale": scale.astype(jnp.float32)}


def _unpack_int4(q: jax.Array) -> jax.Array:
    """int8[in//2, out] nibble-packed -> int8[in, out] (sign-extended)."""
    lo = (q & 0x0F).astype(jnp.int8)
    hi = ((q >> 4) & 0x0F).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    out = jnp.stack([lo, hi], axis=1)                    # [in//2, 2, out]
    return out.reshape(lo.shape[0] * 2, lo.shape[1])


def dequantize(qp: Params, dtype=jnp.float32) -> jax.Array:
    if "qw4" in qp:
        q = _unpack_int4(qp["qw4"])
    else:
        q = qp["qw"]
    return q.astype(dtype) * qp["scale"].astype(dtype)[None, :]


def qdot(x: jax.Array, qp: Params) -> jax.Array:
    """x @ dequant(qw); XLA fuses the dequant into the matmul operand load."""
    dt = x.dtype
    w = dequantize(qp, dt)
    return jnp.matmul(x, w)


# ---------------------------------------------------------------------------
# LLM rewrite
# ---------------------------------------------------------------------------

_QUANT_TARGETS = ("q", "k", "v", "o", "gate", "up", "down")


def quantize_llm(llm_params: Params, bits: int = 8) -> Params:
    """Quantize every transformer-layer projection of a Llama tree.

    Embeddings and norms stay full precision (gather + small); LoRA
    adapters are preserved untouched alongside the quantized base.
    """
    out = {k: v for k, v in llm_params.items()}
    layers = []
    for layer in llm_params["layers"]:
        new_layer = {}
        for name, node in layer.items():
            if name in _QUANT_TARGETS and isinstance(node, dict) and "w" in node:
                qn: Params = quantize_tensor(node["w"], bits)
                if "lora" in node:
                    qn["lora"] = node["lora"]
                new_layer[name] = qn
            else:
                new_layer[name] = node
        layers.append(new_layer)
    out["layers"] = layers
    return out


def is_quantized(node: Any) -> bool:
    return isinstance(node, dict) and ("qw" in node or "qw4" in node)


def quant_bytes(llm_params: Params) -> int:
    """HBM bytes of the (possibly mixed) tree, for analyze_memory."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(llm_params):
        total += leaf.size * leaf.dtype.itemsize
    return total
