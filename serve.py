#!/usr/bin/env python
"""hicdiff_tpu serving CLI: a resident denoising daemon + one-shot client.

No reference counterpart (the reference re-pays model build + checkpoint load
per invocation and has no service surface). Start a daemon that owns the TPU,
compiles once, and answers newline-JSON requests on a Unix socket:

    python serve.py --socket /tmp/hicdiff.sock --weights <ckpt> -s 0.1 \
        --schedule sigmoid --t-start auto --bf16
    python serve.py --client --socket /tmp/hicdiff.sock \
        --request '{"id":1,"op":"denoise","npy":"noisy.npy"}'

See hicdiff_tpu/serve.py for the protocol and the serialization rationale.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--socket", default="/tmp/hicdiff_tpu.sock")
    ap.add_argument("--client", action="store_true",
                    help="act as a one-shot client instead of serving")
    ap.add_argument("--request", type=str, default='{"id":0,"op":"ping"}',
                    help="(client) JSON request to send")
    ap.add_argument("--weights", type=str, default=None,
                    help="checkpoint to serve (default: random init smoke)")
    ap.add_argument("-u", "--unspervised", type=int, default=0, choices=(0, 1),
                    help="which inference path to serve (the reference CLI "
                         "flag): 0 = conditional sampler, 1 = unconditional "
                         "prior + DDRM restoration")
    ap.add_argument("--deg", default="deno",
                    help="(-u 1) degradation operator for the DDRM path")
    ap.add_argument("-s", "--sigma", type=float, default=0.1)
    ap.add_argument("--schedule", default="sigmoid")
    ap.add_argument("--timestep", type=int, default=1000)
    ap.add_argument("--t-start", default="auto")
    ap.add_argument("--sampling-steps", type=int, default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--blocks", type=int, default=32)
    ap.add_argument("--features", type=int, default=256)
    ap.add_argument("--scan-chunk", type=int, default=250)
    ap.add_argument("--use-ema", action="store_true")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--percentile", type=float, default=None,
                    help="normalization percentile for denoise_mcool "
                         "requests. Default: adopt the checkpoint's stored "
                         "value (falling back to train.py's 99.99); an "
                         "explicit value overrides the checkpoint, with a "
                         "warning on mismatch")
    args = ap.parse_args()

    if args.client:
        from hicdiff_tpu.serve import request

        resp = request(args.socket, json.loads(args.request))
        print(json.dumps(resp))
        return 0 if resp.get("ok") else 1

    from hicdiff_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    from hicdiff_tpu.serve import DenoiseService, serve_forever

    service = DenoiseService(
        args.weights, mode="ddrm" if args.unspervised else "cond",
        deg=args.deg, sigma=args.sigma, schedule=args.schedule,
        timesteps=args.timestep, t_start=args.t_start,
        sampling_steps=args.sampling_steps, batch=args.batch, bf16=args.bf16,
        scan_chunk=args.scan_chunk, blocks=args.blocks,
        features=args.features, use_ema=args.use_ema,
        warmup=not args.no_warmup, percentile=args.percentile,
    )
    serve_forever(service, args.socket)
    return 0


if __name__ == "__main__":
    sys.exit(main())
