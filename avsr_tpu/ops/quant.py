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
        # Half-split packing: byte row i holds logical rows i (low nibble)
        # and i + in/2 (high nibble), so a contiguous packed block maps to
        # two contiguous logical-row ranges — the ops.qmatmul decode kernel
        # dequantizes a block with two slices and no interleave.
        half = q.shape[0] // 2
        lo = q[:half] & 0x0F
        hi = (q[half:] & 0x0F) << 4
        packed = (lo | hi).astype(jnp.int8)              # [in//2, out]
        # bit width is encoded in the key name ("qw4h" vs "qw") so the pytree
        # holds arrays only — an int leaf would turn into a tracer under jit.
        return {"qw4h": packed, "scale": scale.astype(jnp.float32)}
    return {"qw": q, "scale": scale.astype(jnp.float32)}


def _unpack_int4(q: jax.Array) -> jax.Array:
    """int8[in//2, out] half-split-packed -> int8[in, out] (sign-extended).

    Inverse of the packing in ``quantize_tensor``: low nibbles are logical
    rows [0, in/2), high nibbles rows [in/2, in)."""
    lo = (q & 0x0F).astype(jnp.int8)
    hi = ((q >> 4) & 0x0F).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    return jnp.concatenate([lo, hi], axis=0)


def _unpack_int4_legacy(q: jax.Array) -> jax.Array:
    """Legacy row-interleaved int4 ("qw4": byte row i = logical rows 2i
    low-nibble / 2i+1 high-nibble) -> int8[in, out]. Kept so checkpoints
    written before the half-split layout change keep restoring."""
    lo = (q & 0x0F).astype(jnp.int8)
    hi = ((q >> 4) & 0x0F).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    out = jnp.stack([lo, hi], axis=1)                    # [in//2, 2, out]
    return out.reshape(lo.shape[0] * 2, lo.shape[1])


def upgrade_legacy_int4(tree: Any) -> Any:
    """Repack every legacy "qw4" (interleaved) leaf dict as "qw4h"
    (half-split) so the ops.qmatmul decode kernel applies. Call on
    checkpoint restore; no-op for current-format trees."""
    def walk(node):
        if isinstance(node, dict):
            if "qw4" in node:
                q = _unpack_int4_legacy(node["qw4"])
                half = q.shape[0] // 2
                packed = ((q[:half] & 0x0F)
                          | ((q[half:] & 0x0F) << 4)).astype(jnp.int8)
                rest = {k: walk(v) for k, v in node.items() if k != "qw4"}
                return {"qw4h": packed, **rest}
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(tree)


def legacy_int4_template(tree: Any) -> Any:
    """Rename every "qw4h" leaf key to the legacy "qw4" (shapes are
    identical — only the nibble layout differs), producing the pytree
    *structure* of a pre-layout-change int4 checkpoint so orbax can
    restore one. Pair with ``upgrade_legacy_int4`` after restore."""
    def walk(node):
        if isinstance(node, dict):
            return {("qw4" if k == "qw4h" else k): walk(v)
                    for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(tree)


def dequantize(qp: Params, dtype=jnp.float32) -> jax.Array:
    if "qw4h" in qp:
        q = _unpack_int4(qp["qw4h"])
    elif "qw4" in qp:                  # legacy interleaved checkpoints
        q = _unpack_int4_legacy(qp["qw4"])
    else:
        q = qp["qw"]
    return q.astype(dtype) * qp["scale"].astype(dtype)[None, :]


def qdot(x: jax.Array, qp: Params,
         out_dtype: jnp.dtype | None = None,
         use_kernel: bool | None = None) -> jax.Array:
    """x @ dequant(qw) -> ``out_dtype`` (default: x.dtype).

    Two regimes (measured on v5e, llama-1B geometry): at training/prefill
    shapes (M = B*T large) the XLA dequant-matmul is fine — the weight
    conversion amortizes over many rows. At decode shapes (one token per
    step) XLA rematerializes the full-width weight every step, so the
    fused ``ops.qmatmul`` Pallas kernel streams the int bytes instead
    (int8 1.25x -> ~2x, int4 0.25x -> ~3x vs bf16 weights).

    ``use_kernel`` is the explicit dispatch override threaded down from
    the jitted entry point (a static arg there, so the decision is baked
    into the right trace-cache entry instead of read from mutable global
    state at trace time — round-1 advisor finding): False forces the XLA
    path (e.g. sharded decode, where a pallas custom-call would make XLA
    all-gather the sharded weights), True trusts the caller that no mesh
    is in play, None keeps the best-effort global detection."""
    dt_out = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    lead, K = x.shape[:-1], x.shape[-1]
    m = 1
    for s in lead:
        m *= s
    from avsr_tpu.ops import qmatmul as qm
    if qm.eligible(m, K, qp, use_kernel=use_kernel):
        y = qm.qmatmul(x.reshape(m, K), qp)     # f32 accumulation
        return y.reshape(*lead, y.shape[-1]).astype(dt_out)
    w = dequantize(qp, x.dtype)
    return jnp.matmul(x, w, preferred_element_type=jnp.promote_types(
        x.dtype, dt_out)).astype(dt_out)


# ---------------------------------------------------------------------------
# LLM rewrite
# ---------------------------------------------------------------------------

_QUANT_TARGETS = ("q", "k", "v", "o", "gate", "up", "down")


def quantize_llm(llm_params: Params, bits: int = 8,
                 lm_head_bits: int | None = None) -> Params:
    """Quantize every transformer-layer projection of a Llama tree.

    The embedding table and norms stay full precision (gather + small);
    LoRA adapters are preserved untouched alongside the quantized base.

    ``lm_head_bits`` additionally quantizes the hidden->vocab projection —
    the single largest per-token HBM read at decode time (vocab 128k x
    d_model 2048 bf16 = 525 MB/token). For tied embeddings this stores a
    quantized *copy* of embed.T under "lm_head" (the fp table still
    serves the token gathers, which touch only the gathered rows); an
    untied lm_head is quantized in place.
    """
    out = {k: v for k, v in llm_params.items()}
    if lm_head_bits:
        if "lm_head" in llm_params and "w" in llm_params["lm_head"]:
            src = llm_params["lm_head"]["w"]
        else:
            src = llm_params["embed"].T
        # Pad the vocab dim to a 2048 multiple: a 128k vocab (128256 =
        # 2^7*3*167) only tiles at bn=768 -> a 167-program kernel grid
        # whose per-program overhead eats the bandwidth win. Zero-padded
        # columns produce zero logits; compute_logits slices them off.
        V = src.shape[1]
        pad = (-V) % 2048 if V > 2048 else 0
        if pad:
            src = jnp.pad(src, ((0, 0), (0, pad)))
        head = quantize_tensor(src, lm_head_bits)
        if isinstance(llm_params.get("lm_head"), dict):
            head = {**{k: v for k, v in llm_params["lm_head"].items()
                       if k not in ("w",)}, **head}
        out["lm_head"] = head
    if not bits:                        # lm-head-only quantization
        return out
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
    return isinstance(node, dict) and ("qw" in node or "qw4h" in node
                                       or "qw4" in node)


def quant_bytes(llm_params: Params) -> int:
    """HBM bytes of the (possibly mixed) tree, for analyze_memory."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(llm_params):
        total += leaf.size * leaf.dtype.itemsize
    return total
