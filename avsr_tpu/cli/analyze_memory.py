"""Memory analysis entry point (ref scripts/clip_whisper/analyze_memory.py).

Per-component parameter memory across precision modes, plus live device
memory stats when a TPU is attached (jax.local_devices()[0].memory_stats()),
written to ``memory_stats.json`` — the reference's standalone
component-loading loop (:320-589) computed on param trees instead of by
repeatedly instantiating torch models.

    python -m avsr_tpu.cli.analyze_memory model.llm.d_model=2048
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import jax

from avsr_tpu.cli.common import base_parser, load_cli_config

log = logging.getLogger("avsr.cli.analyze_memory")

BYTES = {"float32": 4, "bfloat16": 2, "float16": 2, "int8": 1, "int4": 0.5}


def component_bytes(params, dtype_bytes: float) -> dict[str, float]:
    out = {}
    for name, sub in params.items():
        n = sum(int(x.size) for x in jax.tree_util.tree_leaves(sub))
        out[name] = n * dtype_bytes
    return out


def main(argv: list[str] | None = None) -> int:
    p = base_parser("Analyze component memory usage")
    p.add_argument("--output_dir", default="outputs/memory")
    args = p.parse_args(argv)
    cfg = load_cli_config(args)

    from avsr_tpu.models.avsr import init_avsr_model
    from avsr_tpu.train.state import count_trainable

    params = jax.eval_shape(
        lambda k: init_avsr_model(k, cfg.model), jax.random.key(0))
    report: dict = {"modality": cfg.model.modality,
                    "connector": cfg.model.connector_type, "modes": {}}
    for mode, nbytes in (("fp32", 4), ("bf16", 2), ("int8_llm", None),
                         ("int4_llm", None)):
        comps = {}
        for name, sub in params.items():
            n = sum(int(x.size) for x in jax.tree_util.tree_leaves(sub))
            if mode == "int8_llm":
                b = n * (1 if name == "llm" else 2)
            elif mode == "int4_llm":
                b = n * (0.5 if name == "llm" else 2)
            else:
                b = n * nbytes
            comps[name] = round(b / 2**30, 4)
        comps["total_gib"] = round(sum(comps.values()), 4)
        report["modes"][mode] = comps

    trainable, total = count_trainable(params, cfg.model)
    report["params_total"] = total
    report["params_trainable"] = trainable
    report["activation_estimate_gib"] = activation_estimate(cfg)

    dev = jax.local_devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if stats:
        report["device_memory"] = {k: int(v) for k, v in stats.items()
                                   if isinstance(v, (int, float))}
    # real per-component measurements next to the analytic sizes (the
    # reference diffs memory_allocated around standalone component loads,
    # analyze_memory.py:40-87) — catches tile-layout padding and
    # fragmentation the arithmetic above cannot
    report["measured_fp32"] = measured_component_bytes(cfg)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "memory_stats.json", "w") as fh:
        json.dump(report, fh, indent=2)
    save_charts(report, out)
    print(json.dumps(report, indent=2))
    return 0


def activation_estimate(cfg) -> dict[str, float]:
    """Rough per-train-step activation memory (the reference estimates
    batch memory at trainer:933-950). Counts the dominant stored tensors:
    per-LLM-layer residual-stream activations kept for backward (frozen
    encoders are primal-only and store nothing) plus the encoder outputs,
    at compute_dtype width, batch = data.batch_size, worst-case buckets."""
    m, d = cfg.model, cfg.data
    B = d.batch_size
    bytes_el = BYTES.get(cfg.runtime.compute_dtype, 4)
    T_audio = (min(d.audio_buckets[-1], m.whisper.max_frames) // 2
               if m.modality in ("audio", "both") and d.audio_buckets else 0)
    T_video = (d.video_buckets[-1]
               if m.modality in ("video", "both") and d.video_buckets else 0)
    T_fused = min(T_audio + T_video, m.max_seq_len)
    T_pack = T_fused + d.max_label_length + 16          # + prompt margin
    # ~8 stored [B, T, d]-sized tensors per transformer layer w/o remat
    per_layer = 8 * B * T_pack * m.llm.d_model * bytes_el
    ffn = 2 * B * T_pack * m.llm.ffn_dim * bytes_el
    llm = m.llm.n_layers * (per_layer + ffn)
    enc_out = B * T_audio * m.whisper.d_model * bytes_el
    return {
        "llm_no_remat": round(llm / 2**30, 3),
        "llm_remat": round((per_layer + ffn) * 2 / 2**30, 3),
        "encoder_outputs": round(enc_out / 2**30, 4),
        "note": "estimate; mesh.remat trades this for recompute",
    }


def measured_component_bytes(cfg) -> dict[str, dict[str, int]]:
    """Instantiate each component ALONE on device and measure it for real
    (the TPU equivalent of the reference's per-component load loop,
    analyze_memory.py:320-589; round-1 VERDICT next-step #10). jit of
    ``init(...)[name]`` dead-code-eliminates every other component, so each
    measurement allocates exactly one subtree. Two measured columns:

      * ``on_device`` — sum of PJRT ``on_device_size_in_bytes()`` over the
        component's live buffers: the REAL footprint including (8,128) tile
        layout padding the analytic arithmetic can't see;
      * ``allocator_delta`` — ``memory_stats()['bytes_in_use']`` diff around
        the instantiation (catches fragmentation/lifetime costs), on
        backends that expose allocator stats (standard TPU runtimes; the
        tunneled axon plugin and CPU do not).
    """
    from avsr_tpu.models.avsr import init_avsr_model

    dev = jax.local_devices()[0]

    def in_use() -> int | None:
        s = getattr(dev, "memory_stats", lambda: None)()
        return s.get("bytes_in_use") if s else None

    shapes = jax.eval_shape(lambda k: init_avsr_model(k, cfg.model),
                            jax.random.key(0))
    out: dict[str, dict[str, int]] = {}
    for name in shapes:
        base = in_use()
        sub = jax.jit(lambda k, n=name: init_avsr_model(k, cfg.model)[n])(
            jax.random.key(0))
        jax.block_until_ready(sub)
        on_dev = sum(
            leaf.addressable_shards[0].data.on_device_size_in_bytes()
            for leaf in jax.tree_util.tree_leaves(sub))
        row = {"on_device": int(on_dev)}
        if base is not None:
            row["allocator_delta"] = int(in_use() - base)
        out[name] = row
        del sub   # free before fencing the next component
    return out


def save_charts(report: dict, out: Path) -> None:
    """Pie (per-component share) + bar (per-mode totals) charts —
    the reference's visual artifacts (analyze_memory.py:477-574)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        log.warning("matplotlib unavailable — skipping charts")
        return

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4.5))
    bf16 = {k: v for k, v in report["modes"]["bf16"].items()
            if k != "total_gib" and v > 0}
    if bf16:
        ax1.pie(bf16.values(), labels=list(bf16), autopct="%1.1f%%",
                startangle=90)
        ax1.set_title("Component memory share (bf16)")
    else:   # sub-MiB components round to 0 GiB (tiny test models)
        ax1.axis("off")

    modes = list(report["modes"])
    totals = [report["modes"][m]["total_gib"] for m in modes]
    bars = ax2.bar(modes, totals, color="#4878cf")
    ax2.bar_label(bars, fmt="%.2f")
    ax2.set_ylabel("GiB")
    ax2.set_title("Total parameter memory by mode")
    fig.tight_layout()
    fig.savefig(out / "memory_analysis.png", dpi=120)
    plt.close(fig)
    log.info("charts -> %s", out / "memory_analysis.png")


if __name__ == "__main__":
    raise SystemExit(main())
