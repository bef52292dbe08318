"""Vocoder speed-of-light accounting: per-op HBM bytes + FLOPs roofline.

Enumerates every op of the BigVGAN NLC forward at the flagship bench
geometry and computes, per op, the minimum HBM traffic (each operand read
once, each output written once, weights once) and the FLOPs, then the
roofline time  max(bytes / BW_peak, flops / unit_peak)  where matmul-
shaped ops run on the MXU and elementwise/FIR work on the VPU.

Two bounds are reported:

  * sol_op    — per-op bound at the CURRENT op granularity (conv+bias is
                one pass; each anti-aliased activation is one pass;
                residual adds and the resblock mean are their own passes).
                This is the number an implementation with perfectly fused
                individual ops (Pallas kernels per op) can approach.
  * sol_fused — cross-op bound where each stage tensor is written/read
                once per PRODUCER->CONSUMER edge that crosses a kernel
                boundary in a maximally fused implementation (act+conv+
                residual fused into one kernel per conv pair).

Writes VOCODER_ROOFLINE_r04.json at the repo root and prints the table.

Usage: python scripts/roofline.py  (pure host math, no TPU needed)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ditto_tts_tpu.core.config import VocoderConfig

# v5e per-chip peaks (same constants as bench.py)
PEAK_MXU = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0)) * 1e12
PEAK_VPU = float(os.environ.get("BENCH_VPU_TFLOPS", 4.0)) * 1e12
PEAK_BW = float(os.environ.get("BENCH_HBM_GBS", 819.0)) * 1e9

BATCH = int(os.environ.get("BENCH_BATCH", 4))
SECONDS = int(os.environ.get("BENCH_SECONDS", 10))
BYTES = 2          # bf16 carry


def vocoder_ops(cfg: VocoderConfig, batch: int, frames: int):
    """Yield (name, kind, bytes, flops) for every op of the NLC forward."""
    ops = []

    def conv(name, t_out, c_in, c_out, k):
        # read input window (~t_out + halo ~= t_out), write output, weights
        byt = batch * (t_out + k) * c_in * BYTES \
            + batch * t_out * c_out * BYTES + c_in * c_out * k * BYTES
        fl = 2 * batch * t_out * c_in * c_out * k
        ops.append((name, "mxu", byt, fl))

    def act(name, t, c):
        # fused AA activation: read once, write once; ~54 VPU flops/elt
        # (4 six-tap FIRs = 48 MACs->~48, snake sin+mul+add ~6; sin costs
        # more than one VPU op -- the VPU bound is approximate)
        n = batch * t * c
        ops.append((name, "vpu", 2 * n * BYTES, 54 * n))

    def ew(name, t, c, n_in):
        n = batch * t * c
        ops.append((name, "vpu", (n_in + 1) * n * BYTES, n_in * n))

    t = frames
    ch = cfg.upsample_initial_channel
    conv("conv_pre", t, cfg.num_mels, ch, 7)
    for i, rate in enumerate(cfg.upsample_rates):
        t_out = t * rate
        # polyphase ups: VALID conv with r*C_out outputs, taps = k/r
        conv(f"s{i}.ups", t, ch, (ch // 2) * rate,
             cfg.upsample_kernel_sizes[i] // rate)
        ch //= 2
        t = t_out
        for j, k in enumerate(cfg.resblock_kernel_sizes):
            for d in cfg.resblock_dilation_sizes[j]:
                act(f"s{i}.rb{j}.d{d}.act1", t, ch)
                conv(f"s{i}.rb{j}.d{d}.conv1", t, ch, ch, k)
                act(f"s{i}.rb{j}.d{d}.act2", t, ch)
                conv(f"s{i}.rb{j}.d{d}.conv2", t, ch, ch, k)
                ew(f"s{i}.rb{j}.d{d}.residual", t, ch, 2)
        ew(f"s{i}.mean3", t, ch, len(cfg.resblock_kernel_sizes))
    act("act_post", t, ch)
    conv("conv_post", t, ch, 1, 7)
    ew("clip+cast", t, 1, 1)
    return ops


def fused_bound(cfg: VocoderConfig, batch: int, frames: int):
    """Cross-op bound: per conv pair one kernel does act+conv(+residual):
    read x once, write out once; convs keep their MXU flops; acts keep
    their VPU flops (computed in-register)."""
    ops = vocoder_ops(cfg, batch, frames)
    # each (act,conv) pair becomes one pass: drop the act bytes (their
    # reads/writes fold into the conv kernel's), keep all flops
    b = sum(byt for name, kind, byt, fl in ops
            if ".act" not in name and name != "act_post")
    t_mxu = sum(fl / PEAK_MXU for _, kind, _, fl in ops if kind == "mxu")
    t_vpu = sum(fl / PEAK_VPU for _, kind, _, fl in ops if kind == "vpu")
    return max(b / PEAK_BW, t_mxu + t_vpu), b


def main():
    cfg = VocoderConfig()
    frames = 24_000 * SECONDS // cfg.hop_size
    ops = vocoder_ops(cfg, BATCH, frames)

    per_stage = {}
    tot_bytes = tot_mxu_fl = tot_vpu_fl = tot_time = 0.0
    for name, kind, byt, fl in ops:
        peak = PEAK_MXU if kind == "mxu" else PEAK_VPU
        t_op = max(byt / PEAK_BW, fl / peak)
        stage = name.split(".")[0]
        s = per_stage.setdefault(stage, dict(bytes=0.0, flops=0.0,
                                             seconds=0.0))
        s["bytes"] += byt
        s["flops"] += fl
        s["seconds"] += t_op
        tot_bytes += byt
        tot_time += t_op
        if kind == "mxu":
            tot_mxu_fl += fl
        else:
            tot_vpu_fl += fl

    sol_fused_s, fused_bytes = fused_bound(cfg, BATCH, frames)

    print(f"{'stage':12s} {'GB':>7s} {'GFLOP':>9s} {'SoL ms':>8s}")
    for k, v in per_stage.items():
        print(f"{k:12s} {v['bytes']/1e9:7.3f} {v['flops']/1e9:9.1f} "
              f"{v['seconds']*1e3:8.2f}")
    print(f"{'TOTAL':12s} {tot_bytes/1e9:7.3f} "
          f"{(tot_mxu_fl+tot_vpu_fl)/1e9:9.1f} {tot_time*1e3:8.2f}")
    print(f"MXU-only time {tot_mxu_fl/PEAK_MXU*1e3:.1f} ms; "
          f"VPU-only {tot_vpu_fl/PEAK_VPU*1e3:.1f} ms; "
          f"pure-BW {tot_bytes/PEAK_BW*1e3:.1f} ms")
    print(f"sol_fused {sol_fused_s*1e3:.1f} ms ({fused_bytes/1e9:.2f} GB)")

    out = {
        "geometry": f"B={BATCH}, {SECONDS}s, {frames} mel frames, bf16 carry",
        "peaks": {"mxu_tflops": PEAK_MXU / 1e12, "vpu_tflops": PEAK_VPU / 1e12,
                  "hbm_gb_s": PEAK_BW / 1e9},
        "total_bytes_gb": round(tot_bytes / 1e9, 3),
        "total_mxu_gflop": round(tot_mxu_fl / 1e9, 1),
        "total_vpu_gflop": round(tot_vpu_fl / 1e9, 1),
        "sol_op_ms": round(tot_time * 1e3, 2),
        "sol_fused_ms": round(sol_fused_s * 1e3, 2),
        "per_stage_ms": {k: round(v["seconds"] * 1e3, 2)
                         for k, v in per_stage.items()},
        "note": "sol_op = per-op roofline (each op reads inputs once, "
                "writes outputs once; MXU for convs, VPU for acts/elementwise)"
                "; sol_fused = act+conv+residual fused per kernel. VPU peak "
                "is approximate (sin weighting).",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "VOCODER_ROOFLINE_r04.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
