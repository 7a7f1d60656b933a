#!/usr/bin/env python
"""Benchmark: denoising throughput of the conditional hicedrn diffusion model.

This is the BASELINE.json north-star metric (the `inference.py -u 0` hot
loop; the reference runs 1000 sequential Python-loop backbone forwards per
batch, src/hicdiff_condition.py:615-617).

Default configuration: truncated conditional sampling (--t-start auto) — the
reverse chain starts at the timestep whose forward marginal exactly matches
the sigma-noised input (t*=29 of 1000 at sigma=0.1, sigmoid schedule), so the
full denoising result costs t*+1 model forwards. Measured on the trained
fixture model this configuration is BETTER than the full 1000-step chain on
every metric (SSIM/PSNR/MSE/PCC/SPC/GenomeDISCO — table in VALIDATION.md).
Pass --t-start full for the 1000-step-chain metric of earlier rounds.

vs_baseline: the driver-set target is a full GSE130711 human cell (~5,400
64x64 band patches at 40 kb across 22 chromosomes) in <60 s on a v5e-8,
i.e. ~11.3 patches/s/chip. vs_baseline = measured / 11.3 (>= 1.0 meets the
target). The reference publishes no GPU numbers to compare against
(BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import argparse
import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TARGET_PATCHES_PER_SEC_PER_CHIP = 5400.0 / 60.0 / 8.0  # ~11.25

# v5e ("TPU v5 lite") bf16 peak. NOT the 394 TOPS int8 figure — that
# misattribution produced round 2's wrong 48%-of-peak claim (VALIDATION.md,
# conv-ceiling section).
V5E_BF16_PEAK_TFLOPS = 197.0


def backbone_flops_per_forward(image_size=64, features=256, blocks=32):
    """Analytic FLOPs of one hicedrn backbone forward.

    The profile (VALIDATION.md conv-ceiling section) shows 99.9% of device
    time is the blocks x 2 shared-conv applications (3x3, features ->
    features, stride 1, same padding) — so the conv count IS the FLOP count
    to within 0.1%: 2*H*W*9*C^2 per application, plus the in/out head convs
    (<0.02% for the production 32x256 config, included for exactness)."""
    per_conv = 2.0 * image_size * image_size * 9 * features * features
    head = 2.0 * image_size * image_size * 9 * features * (2 + 1)
    return blocks * 2 * per_conv + head


def device_peak_tflops(dtype_is_bf16: bool):
    """bf16 peak of the chip actually benched, or None when unknown (CPU runs,
    fp32, or an unrecognized TPU generation) — mfu is then reported null
    rather than against a guessed denominator."""
    if not dtype_is_bf16:
        return None
    import jax

    kind = getattr(jax.devices()[0], "device_kind", "")
    if "v5 lite" in kind or "v5e" in kind.lower():
        return V5E_BF16_PEAK_TFLOPS
    return None


def add_utilization(result, forwards_per_sec_per_chip, flops_per_forward,
                    dtype_is_bf16):
    """VERDICT r4 ask 7: carry utilization in the bench contract itself.
    tflops_effective = delivered model-FLOPs per second per chip; mfu = that
    over the chip's bf16 peak (null when the peak is unknown)."""
    tfe = forwards_per_sec_per_chip * flops_per_forward / 1e12
    result["tflops_effective"] = round(tfe, 2)
    peak = device_peak_tflops(dtype_is_bf16)
    result["mfu"] = round(tfe / peak, 4) if peak else None
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000, help="diffusion T")
    ap.add_argument("--sampling-steps", type=int, default=None,
                    help="DDIM fast path: K < T sampling steps over the "
                         "T-step schedule (the quality-parity regime measured "
                         "in VALIDATION.md). Throughput is reported raw, not "
                         "normalized to T, because DDIM at parity-K delivers "
                         "the full denoising result")
    ap.add_argument("--ddim-eta", type=float, default=0.0)
    ap.add_argument("--t-start", type=str, default="auto",
                    help="truncated conditional sampling: 'auto' (exact-"
                         "marginal timestep for --sigma — the DEFAULT bench "
                         "config; measured better than the full chain on "
                         "every metric, VALIDATION.md), an int timestep, or "
                         "'full' to run the whole T-step chain")
    ap.add_argument("--sigma", type=float, default=0.1,
                    help="measurement noise level for --t-start auto")
    ap.add_argument("--batch", type=int, default=64,
                    help="patch batch per chip (64 = the production CLI "
                         "default; measured ~2.5%% faster per patch than 32 "
                         "on the truncated chain, and safe at any chain "
                         "length under --scan-chunk)")
    ap.add_argument("--fp32", action="store_true", help="disable bf16 compute")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--fused", action="store_true",
                    help="use the Pallas fused posterior-step kernel")
    ap.add_argument("--fused-resblock", action="store_true",
                    help="run the backbone through the Pallas fused "
                         "ResnetBlock kernel (kernels/resblock.py)")
    ap.add_argument("--profile", type=str, default=None,
                    help="write a jax profiler trace to this directory")
    ap.add_argument("--train", action="store_true",
                    help="benchmark the training step instead of sampling")
    ap.add_argument("--ddrm", action="store_true",
                    help="benchmark the unconditional DDRM restoration path "
                         "(-u 1: uncond backbone inside the spectral-update "
                         "scan, deg=deno, linear betas — "
                         "sample/stard_metric_diff.py's working config). "
                         "--sampling-steps sets the chain length (default "
                         "1000); --t-start auto (the default) truncates to "
                         "the exact-marginal start (t*=27 at sigma=0.1), "
                         "--t-start full runs the reference's full grid")
    ap.add_argument("--scan-chunk", type=int, default=250,
                    help="split the reverse chain into scan segments of at "
                         "most this many steps (separate XLA executions; "
                         "keeps any batch size under the tunneled worker's "
                         "~3-min per-execution limit). 0 = one unchunked "
                         "scan — the pre-round-3 behavior, which crashes "
                         "the worker at --t-start full --batch >= 64")
    args = ap.parse_args()

    import jax

    from hicdiff_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    # Backend watchdog: when the remote-TPU tunnel is dead, jax.devices()
    # blocks forever (observed: clients futex-wait for hours) — fail loudly
    # instead so callers see an error, not a hang. devices() on a healthy
    # backend returns in seconds; HICDIFF_BENCH_BACKEND_TIMEOUT overrides.
    import threading

    probe = {}

    def _probe():
        try:
            probe["devices"] = jax.devices()
        except Exception as e:  # surfaced below
            probe["error"] = e

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(float(os.environ.get("HICDIFF_BENCH_BACKEND_TIMEOUT", "300")))
    if th.is_alive():
        sys.exit(
            "bench: jax.devices() did not return within the backend timeout "
            "— the TPU tunnel is down (CLAUDE.md backend facts). Re-run when "
            "it recovers, or set HICDIFF_PLATFORM=cpu for a functional "
            "(non-benchmark) run."
        )
    if "error" in probe:
        raise probe["error"]

    import jax.numpy as jnp

    from hicdiff_tpu.diffusion.gaussian import GaussianDiffusion
    from hicdiff_tpu.models.hicedrn import HicedrnDiff
    from hicdiff_tpu.parallel.mesh import data_sharding, make_mesh, replicate

    n_chips = len(jax.devices())
    mesh = make_mesh()
    dtype = None if args.fp32 else jnp.bfloat16

    if args.ddrm:
        # ---- the -u 1 restoration hot loop (denoising.py:11-111 re-design)
        from hicdiff_tpu.degrade.operators import make_operator
        from hicdiff_tpu.diffusion.schedules import get_beta_schedule
        from hicdiff_tpu.sampling.ddrm import (
            _build_seq,
            ddrm_auto_t_start,
            make_chunked_ddrm_sampler,
        )

        if args.fused_resblock:
            sys.exit("--fused-resblock fuses the conditional sampler's "
                     "backbone; drop it for --ddrm")
        if args.train:
            sys.exit("--train and --ddrm are separate hot loops; pick one")
        if args.steps != 1000:
            sys.exit("--ddrm runs the fixed 1000-beta linear chain (the "
                     "working -u 1 config, metrics_diff.py:102-107); shorten "
                     "it with --sampling-steps or --t-start, not --steps")

        rng = jax.random.PRNGKey(0)
        ddrm_model = HicedrnDiff(self_condition=False, dtype=dtype)
        params = replicate(
            mesh,
            ddrm_model.init(
                rng, jnp.zeros((1, 64, 64, 1)), jnp.zeros((1,), jnp.int32),
                None,
            )["params"],
        )
        betas = jnp.asarray(
            get_beta_schedule("linear", beta_start=0.0001, beta_end=0.02,
                              num_diffusion_timesteps=1000),
            jnp.float32,
        )
        k_steps = min(args.sampling_steps or 1000, 1000)
        h_funcs = make_operator("deno", image_channel=1, image_size=64)
        # --t-start (default 'auto'): truncated DDRM — exact-marginal
        # spectral init at t*, matching inference.py -u 1 --t-start auto.
        # 'full' gives the round-3 full-grid restoration metric. (deno is
        # full-rank so auto never falls back to the full chain here.)
        t_start = None
        if str(args.t_start) not in ("full", "none"):
            t_start = (ddrm_auto_t_start(h_funcs, betas, args.sigma,
                                         image_dim=64 * 64)
                       if args.t_start == "auto" else int(args.t_start))
        n_steps = len(_build_seq(1000, k_steps, t_start))
        restore = make_chunked_ddrm_sampler(
            lambda x, t: ddrm_model.apply({"params": params}, x, t, None),
            h_funcs,
            sigma_0=args.sigma, betas=betas, timestep=k_steps,
            num_timesteps=1000, t_start=t_start,
            chunk_steps=args.scan_chunk or n_steps,
        )
        b = args.batch * n_chips
        y = jax.device_put(
            jnp.clip(jax.random.normal(rng, (b, 64 * 64)) * 0.3, -1, 1),
            data_sharding(mesh),
        )

        def ddrm_once(key):
            return float(restore(key, y)[0, 0, 0, 0])  # real host fetch

        ddrm_once(rng)  # compile
        times = []
        ctx = (jax.profiler.trace(args.profile) if args.profile
               else contextlib.nullcontext())
        with ctx:
            for i in range(args.repeats):
                t0 = time.time()
                ddrm_once(jax.random.fold_in(rng, i))
                times.append(time.time() - t0)
        dt = min(times)
        pps = b / dt / n_chips
        tstart_tag = f"tstart{t_start}_" if t_start is not None else ""
        print(json.dumps(add_utilization({
            "metric": (f"ddrm_patches_per_sec_per_chip_{tstart_tag}"
                       f"{n_steps}step_restoration"),
            "value": round(pps, 3),
            "unit": "patches/s/chip",
            "vs_baseline": round(pps / TARGET_PATCHES_PER_SEC_PER_CHIP, 3),
        }, pps * n_steps, backbone_flops_per_forward(), not args.fp32)))
        print(f"# raw: {b} patches x {n_steps} DDRM steps in {dt:.2f}s on "
              f"{n_chips} chip(s), dtype={'fp32' if args.fp32 else 'bf16'}",
              file=sys.stderr)
        return

    model = HicedrnDiff(self_condition=True, dtype=dtype)
    if args.fused_resblock:
        from hicdiff_tpu.models.fastpath import FusedHicedrn

        model = FusedHicedrn(model)
    engine = GaussianDiffusion.create(
        model, image_size=64, timesteps=args.steps, loss_type="l2",
        beta_schedule="sigmoid", mode="cond", fused_sample_step=args.fused,
        sampling_timesteps=args.sampling_steps, ddim_sampling_eta=args.ddim_eta,
    )
    if args.t_start not in (None, "full", "none"):
        import dataclasses

        ts = (engine.truncation_timestep(args.sigma)
              if args.t_start == "auto" else int(args.t_start))
        engine = dataclasses.replace(engine, t_start=ts)
    rng = jax.random.PRNGKey(0)
    params = replicate(mesh, engine.init_params(rng))
    sharding = data_sharding(mesh)

    b = args.batch * n_chips
    cond = jax.device_put(
        jnp.clip(jax.random.normal(rng, (b, 64, 64, 1)) * 0.3, -1, 1), sharding
    )

    if args.train:
        if args.fused_resblock:
            sys.exit("--fused-resblock is an inference fast path (no VJP); "
                     "drop it for --train")
        import numpy as np

        from hicdiff_tpu.train.trainer import Trainer

        trainer = Trainer(engine, lr=2e-5, mesh=mesh)
        params_t, opt_state = trainer.init(rng)
        target = np.asarray(cond)
        data = np.clip(
            target + 0.1 * np.random.default_rng(0)
            .standard_normal(target.shape).astype("float32"),
            -1, 1,
        )
        def train_once(i):
            nonlocal params_t, opt_state
            params_t, opt_state, loss = trainer.train_step(
                params_t, opt_state, jax.random.fold_in(rng, i), data, target
            )
            return loss

        train_once(0)  # compile
        steps = 10
        t0 = time.time()
        for i in range(1, steps + 1):
            loss = train_once(i)
        dt = (time.time() - t0) / steps
        # no published reference training numbers exist (BASELINE.md) and the
        # driver's vs_baseline target is an INFERENCE metric, so there is no
        # honest external denominator here: vs_baseline is null, and the
        # regression ratio against this repo's own round-1 measurement (140
        # patches/s/chip on one v5e) is reported under its own name
        ROUND1_MEASURED_PPS = 140.0
        pps = b / dt / n_chips
        result = {
            "metric": "train_patches_per_sec_per_chip",
            "value": round(pps, 2),
            "unit": "patches/s/chip",
            "vs_baseline": None,
            "vs_round1_self_measurement": round(pps / ROUND1_MEASURED_PPS, 3),
        }
        # fwd + backward ~ 3x one forward's FLOPs (cond training runs exactly
        # one backbone forward per sample, gaussian.p_losses)
        add_utilization(result, pps * 3.0, backbone_flops_per_forward(),
                        not args.fp32)
        print(json.dumps(result))
        print(f"# raw: {steps} steps of batch {b} in {dt*steps:.2f}s, "
              f"final loss {loss:.4f}", file=sys.stderr)
        return

    # sharding rides on the committed (device_put) cond; explicit in_shardings
    # showed pathological fp32 compiles on this backend (see CLAUDE.md).
    # scan_chunk bounds each XLA execution (worker-crash guard at large batch)
    if args.scan_chunk:
        sr = engine.chunked_sampler(args.scan_chunk)
    else:
        sr = jax.jit(lambda p, k, c: engine.super_resolution(p, k, c))

    def run_once(key):
        out = sr(params, key, cond)
        # force a real device->host fetch: on tunneled backends
        # block_until_ready() can return before execution completes
        return float(out[0, 0, 0, 0])

    # compile (not timed)
    run_once(rng)

    times = []
    if args.profile:
        with jax.profiler.trace(args.profile):
            run_once(jax.random.fold_in(rng, 99))
    for i in range(args.repeats):
        t0 = time.time()
        run_once(jax.random.fold_in(rng, i))
        times.append(time.time() - t0)
    dt = min(times)

    patches_per_sec_per_chip = b / dt / n_chips
    if engine.t_start is not None:
        # truncated chain: full denoising result in t_start+1 (or K) forwards
        n_fwd = engine.t_start + 1
        ddim_tag = ""
        if engine.is_ddim_sampling:
            n_fwd = min(args.sampling_steps, n_fwd)
            ddim_tag = f"_ddim{n_fwd}"
        result = {
            "metric": (
                f"patches_per_sec_per_chip_tstart{engine.t_start}{ddim_tag}"
                f"_of_T{args.steps}_reverse_sampling"
            ),
            "value": round(patches_per_sec_per_chip, 3),
            "unit": "patches/s/chip",
            "vs_baseline": round(
                patches_per_sec_per_chip / TARGET_PATCHES_PER_SEC_PER_CHIP, 3
            ),
        }
    elif args.sampling_steps and args.sampling_steps < args.steps:
        # DDIM at quality parity delivers the full denoising result: report
        # raw throughput against the <60 s/v5e-8 full-cell target
        n_fwd = args.sampling_steps
        result = {
            "metric": (
                f"patches_per_sec_per_chip_ddim{args.sampling_steps}"
                f"_of_T{args.steps}_reverse_sampling"
            ),
            "value": round(patches_per_sec_per_chip, 3),
            "unit": "patches/s/chip",
            "vs_baseline": round(
                patches_per_sec_per_chip / TARGET_PATCHES_PER_SEC_PER_CHIP, 3
            ),
        }
    else:
        # normalize to the 1000-step contract if fewer steps were run
        n_fwd = args.steps
        norm = patches_per_sec_per_chip * (args.steps / 1000.0)
        result = {
            "metric": "patches_per_sec_per_chip_1000step_reverse_sampling",
            "value": round(norm, 3),
            "unit": "patches/s/chip",
            "vs_baseline": round(norm / TARGET_PATCHES_PER_SEC_PER_CHIP, 3),
        }
    # n_fwd is the ACTUAL chain length run in every branch, so raw pps * n_fwd
    # is the delivered backbone-forward rate regardless of metric normalization
    add_utilization(result, patches_per_sec_per_chip * n_fwd,
                    backbone_flops_per_forward(), not args.fp32)
    print(json.dumps(result))
    print(
        f"# raw: {b} patches x {n_fwd} model forwards in {dt:.2f}s on "
        f"{n_chips} chip(s), dtype={'fp32' if args.fp32 else 'bf16'}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
