"""Fused weight-only-quantized matmul Pallas kernel for decode shapes.

The XLA path for a quantized linear (``ops.quant.qdot``) computes
``x @ (int8 -> f32 * scale)``; at training shapes (M = B*T in the
thousands) the dequantized weight materialization amortizes over many
rows, but at decode shapes (M = batch, one token per step) XLA
materializes the full f32/bf16 weight in HBM every step — the measured
int8 decode win collapses to 1.25x (int4 goes 4x *slower*). Generation
is pure HBM bandwidth (SURVEY.md §7 "quantized LLM on TPU"), so the fix
is a kernel that streams the **int-packed** bytes through VMEM and
dequantizes on-chip:

    grid (N/bn, K/bk); x resident in VMEM; per step load int8 block
    [bk, bn] -> f32 on the VPU -> MXU accumulate into the [M, bn] f32
    output block; multiply the per-channel scale once on the last K step.

int4 uses a half-split packing (byte row i holds logical rows i and
i + K/2 — see ``ops.quant.quantize_tensor``) so a packed block maps to
two contiguous x slices and needs no in-kernel interleave.

HBM traffic per token drops 2x (int8) / 4x (int4) vs bf16 weights; the
kernel is dispatched from ``ops.quant.qdot`` only for small M (decode /
beam search) where the bandwidth, not the MXU, is the bottleneck.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Decode/beam-search shapes only: past this many rows the op turns
# compute-shaped and the XLA dequant-matmul path is the right one.
MAX_SMALL_M = 64

# Multi-chip decode must keep the XLA dequant-matmul: set by the decode
# CLI before tracing when a device mesh is in use (cli/decode.py).
_FORCE_XLA = False


def set_force_xla(flag: bool) -> None:
    """Disable the Pallas path (e.g. sharded decode — see eligible())."""
    global _FORCE_XLA
    _FORCE_XLA = bool(flag)


def _mesh_active() -> bool:
    if _FORCE_XLA:
        return True
    try:
        from jax.interpreters import pxla
        return not pxla.thread_resources.env.physical_mesh.empty
    except Exception:  # noqa: BLE001 — mesh introspection is best-effort
        return False

# Per-program overhead dominates small grids (same finding as the flash
# kernel's _auto_block): make each weight block as big as a VMEM budget
# allows so the grid has as few programs as possible.
_BLOCK_BUDGET_BYTES = 4 * 1024 * 1024
_N_BLOCKS = (2048, 1536, 1024, 768, 512, 384, 256, 128)
_K_BLOCKS = (4096, 2048, 1024, 512, 256)


def _pick(n: int, candidates, limit: int | None = None) -> int | None:
    for c in candidates:
        if limit is not None and c > limit:
            continue
        if n % c == 0:
            return c
    return None


def _blocks(rows: int, n: int, itemsize: float) -> tuple[int, int] | None:
    """(bk, bn) over the packed-row x out grid, maximizing block bytes
    under the VMEM budget (bn chosen first: output-block reuse)."""
    bn = _pick(n, _N_BLOCKS)
    if bn is None:
        return None
    bk = _pick(rows, _K_BLOCKS,
               limit=max(int(_BLOCK_BUDGET_BYTES / (bn * itemsize)), 256))
    if bk is None:
        return None
    return bk, bn


def eligible(m: int, k: int, qp, use_kernel: bool | None = None) -> bool:
    """Kernel applicability: small M, tileable K/N, TPU backend, no mesh.

    ``use_kernel`` overrides the mesh *policy* (not the shape/backend
    requirements): False forces the XLA path, True skips the best-effort
    global mesh detection (the caller threaded the decision down from a
    static jit arg — ops.quant.qdot), None keeps the detection."""
    import jax  # local: keep module import-light for CPU-only consumers
    if use_kernel is False:
        return False
    if jax.default_backend() != "tpu":   # Mosaic kernels are TPU-only
        return False
    if use_kernel is not True and _mesh_active():
        # A pallas custom-call has no GSPMD partitioning rule: under a
        # tp/fsdp mesh XLA would all-gather the sharded quantized weights
        # every decode step. The XLA dequant-matmul shards cleanly.
        return False
    if m > MAX_SMALL_M:
        return False
    if "qw4" in qp:
        # legacy interleaved int4 layout: the kernel expects half-split
        # packing; ops.quant.dequantize reads it, upgrade_legacy_int4
        # repacks it for the kernel.
        return False
    n = qp["scale"].shape[0]
    if "qw4h" in qp:
        # packed rows = K/2; a K block maps to bk/2 packed rows
        return k % 2 == 0 and _blocks(k // 2, n, 1.0) is not None
    return _blocks(k, n, 1.0) is not None


def _int8_kernel(x_ref, w_ref, s_ref, o_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    bk = w_ref.shape[0]
    # bf16 operands, f32 accumulation: int8 magnitudes (<=127) are exact
    # in bf16, and f32-operand MXU matmuls are ~6x slower on v5e. x stays
    # f32-resident (8-sublane tile); only the [M, bk] slice converts.
    xs = x_ref[:, pl.ds(k * bk, bk)].astype(jnp.bfloat16)
    o_ref[:] += jnp.dot(xs, w_ref[:].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = o_ref[:] * s_ref[:]


def _int4_kernel(x_ref, p_ref, s_ref, o_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    bk2 = p_ref.shape[0]                    # packed rows this step
    half = x_ref.shape[1] // 2
    # Nibble math in int32: Mosaic has no int8 vector shifts
    # (arith.shli on vector<i8> fails to legalize), and the widening is
    # VPU-only — the HBM read above was still the packed bytes.
    p = p_ref[:].astype(jnp.int32)
    lo = p & 0x0F
    lo = jnp.where(lo >= 8, lo - 16, lo).astype(jnp.bfloat16)
    hi = (p >> 4) & 0x0F
    hi = jnp.where(hi >= 8, hi - 16, hi).astype(jnp.bfloat16)
    xlo = x_ref[:, pl.ds(k * bk2, bk2)].astype(jnp.bfloat16)
    xhi = x_ref[:, pl.ds(half + k * bk2, bk2)].astype(jnp.bfloat16)
    acc = jnp.dot(xlo, lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(xhi, hi, preferred_element_type=jnp.float32)
    o_ref[:] += acc

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = o_ref[:] * s_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def qmatmul(x: jax.Array, qp, *, interpret: bool = False) -> jax.Array:
    """x [M, K] @ dequant(qp) -> f32 [M, N]; int bytes never leave HBM wide.

    ``qp`` is an ``ops.quant`` pytree ({"qw": int8[K, N]} or
    {"qw4h": int8[K/2, N]} plus {"scale": f32[N]}). M is padded to the f32
    sublane tile (8) internally.
    """
    M, K = x.shape
    int4 = "qw4h" in qp
    w = qp["qw4h"] if int4 else qp["qw"]
    N = w.shape[1]
    scale = qp["scale"].reshape(1, N).astype(jnp.float32)

    rows = K // 2 if int4 else K
    picked = _blocks(rows, N, 1.0)
    if picked is None:
        raise ValueError(f"qmatmul: untileable shape K={K} N={N}")
    bk, bn = picked

    Mp = -(-M // 8) * 8
    xf = x.astype(jnp.float32)
    if Mp != M:
        xf = jnp.pad(xf, ((0, Mp - M), (0, 0)))

    kernel = _int4_kernel if int4 else _int8_kernel
    itemsize = 0.5 if int4 else 1.0
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        grid=(N // bn, rows // bk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),          # x resident
            pl.BlockSpec((bk, bn), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, bn), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=int(K * N * itemsize) + 4 * Mp * K + 4 * Mp * N,
            transcendentals=0),
        # The int4 path widens the packed block to int32 + two f32 halves
        # on-chip; with 4 MB input blocks that exceeds Mosaic's default
        # 16 MB scoped-VMEM budget. Same raise as ops.attention.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(xf, w, scale)
    return out[:M] if Mp != M else out
