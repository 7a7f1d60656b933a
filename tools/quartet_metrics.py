"""Score a saved Outputs_diff quartet (target/noisy/predict npys) on CPU.

The reference's evaluators (src/Utils/metrics_cond.py:126-134) persist the
npy quartet but never re-score it; re-evaluation always re-runs the sampler.
This tool closes that loop: it recomputes the full stard_metrics suite
(src/Utils/stard_metrics.py:148-182 semantics via MetricAccumulator) from a
quartet already on disk — e.g. the identity baseline (predict := noisy
measurement) costs zero model forwards this way.

Usage:
  python tools/quartet_metrics.py --dir Outputs_diff/<run> [--predict noisy]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # host math only; never dial the TPU

from hicdiff_tpu.metrics.harness import MetricAccumulator


def score_quartet(outdir: str, predict_kind: str = "predict",
                  batch_size: int = 64, quirk_compat: bool = True,
                  target_file: str = "target.npy",
                  gds_skip_empty: bool = False) -> dict:
    """Recompute the metric suite from a saved quartet directory.

    predict_kind 'predict' scores the saved model output; 'noisy' scores the
    identity baseline (predict := the noisy measurement itself); 'target'
    scores the realized target as a prediction (only meaningful against an
    alternative target_file, e.g. the latent pre-Poisson ground truth written
    by tools/latent_target.py — it measures the generator's sampling-noise
    floor).
    """
    target = np.load(os.path.join(outdir, target_file))
    pred = np.load(os.path.join(outdir, f"{predict_kind}.npy"))
    # quartets are persisted NCHW (reference layout); metrics want NHWC
    to_nhwc = lambda a: np.transpose(a, (0, 2, 3, 1)) if a.ndim == 4 else a
    target, pred = to_nhwc(target), to_nhwc(pred)
    acc = MetricAccumulator(quirk_compat=quirk_compat,
                            gds_skip_empty=gds_skip_empty)
    for i in range(0, len(target), batch_size):
        hr01 = np.clip((target[i:i + batch_size] + 1.0) / 2.0, 0.0, 1.0)
        out01 = np.clip((pred[i:i + batch_size] + 1.0) / 2.0, 0.0, 1.0)
        acc.update(out01, hr01)
    return acc.result()


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dir", required=True, help="Outputs_diff run directory")
    ap.add_argument("--predict", default="predict",
                    choices=["predict", "noisy", "target"],
                    help="which array to score as the prediction ('target' "
                         "scores the realized target itself — use with "
                         "--target-file latent.npy to measure the sampling-"
                         "noise floor)")
    ap.add_argument("--target-file", default="target.npy",
                    help="array to score AGAINST (default the quartet's "
                         "realized target; 'latent.npy' scores against the "
                         "pre-Poisson ground truth from tools/latent_target.py)")
    ap.add_argument("--batch", type=int, default=64,
                    help="scoring batch size. With the default quirk-compat "
                         "accumulator the suite is a running mean of per-"
                         "batch means (stard_metrics.py:167-172 semantics), "
                         "so the result DEPENDS on this value — re-scored "
                         "numbers match an original in-process eval only at "
                         "the batch size that eval used (inference.py -b). "
                         "--no-quirk removes the sensitivity entirely")
    ap.add_argument("--no-quirk", action="store_true",
                    help="plain sample-weighted means instead of the "
                         "reference's running-mean-of-means quirk")
    ap.add_argument("--gds-skip-empty", action="store_true",
                    help="skip GenomeDISCO on empty-TARGET patches (the "
                         "reference guards only the batch sum, so empty "
                         "far-band patches score -1 against any nonzero "
                         "prediction and dominate sparse-fixture means)")
    args = ap.parse_args()
    metrics = score_quartet(args.dir, args.predict, args.batch,
                            quirk_compat=not args.no_quirk,
                            target_file=args.target_file,
                            gds_skip_empty=args.gds_skip_empty)
    print(json.dumps({"dir": args.dir, "predict": args.predict,
                      "target": args.target_file, **metrics}))


if __name__ == "__main__":
    main()
