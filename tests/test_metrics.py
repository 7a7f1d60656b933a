"""Metric parity tests against torch/scipy ground truths."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from scipy.stats import pearsonr, spearmanr

from hicdiff_tpu.metrics.genomedisco import compute_reproducibility, to_transition
from hicdiff_tpu.metrics.image import (
    inverse_data_transform,
    mse,
    pearson,
    psnr,
    snr,
    spearman,
    ssim,
)
from hicdiff_tpu.metrics.insulation import insulation_loss


def torch_ssim(img1, img2, window_size=11):
    """Inline DeepHiC SSIM ground truth (SSIM.py:6-74)."""
    from math import exp

    def gaussian(ws, sigma):
        g = torch.Tensor([exp(-((x - ws // 2) ** 2) / (2 * sigma**2)) for x in range(ws)])
        return g / g.sum()

    channel = img1.size(1)
    _1d = gaussian(window_size, 1.5).unsqueeze(1)
    _2d = _1d.mm(_1d.t()).float().unsqueeze(0).unsqueeze(0)
    window = _2d.expand(channel, 1, window_size, window_size).contiguous()
    mu1 = F.conv2d(img1, window, padding=window_size // 2, groups=channel)
    mu2 = F.conv2d(img2, window, padding=window_size // 2, groups=channel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1.pow(2), mu2.pow(2), mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=window_size // 2, groups=channel) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=window_size // 2, groups=channel) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=window_size // 2, groups=channel) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return m.mean().item()


def test_ssim_matches_torch_reference():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (4, 1, 64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    ref = torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
    ours = float(ssim(np.transpose(a, (0, 2, 3, 1)), np.transpose(b, (0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_ssim_identical_images():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32)
    assert float(ssim(a, a)) > 0.999


def test_psnr_mse_snr():
    rng = np.random.default_rng(2)
    hr = rng.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32)
    out = np.clip(hr + 0.1 * rng.normal(size=hr.shape).astype(np.float32), 0, 1)
    m = float(mse(out, hr))
    np.testing.assert_allclose(float(psnr(out, hr)), 10 * np.log10(1 / m), rtol=1e-5)
    ref_snr = hr.sum() / np.sqrt(((hr - out) ** 2).sum())
    np.testing.assert_allclose(float(snr(hr, out)), ref_snr, rtol=1e-4)
    z = np.zeros_like(hr)
    assert float(snr(z, z)) == 0.0


def test_correlations_match_scipy():
    rng = np.random.default_rng(3)
    x = rng.normal(size=1000).astype(np.float32)
    y = 0.6 * x + 0.4 * rng.normal(size=1000).astype(np.float32)
    np.testing.assert_allclose(float(pearson(x, y)), pearsonr(x, y)[0], atol=1e-5)
    np.testing.assert_allclose(spearman(x, y), spearmanr(x, y)[0], atol=1e-6)
    # with heavy ties (Hi-C data is full of zeros)
    xt = np.round(x * 2) / 2
    yt = np.round(y * 2) / 2
    np.testing.assert_allclose(spearman(xt, yt), spearmanr(xt, yt)[0], atol=1e-6)


def test_genomedisco_selfsimilarity_and_range():
    rng = np.random.default_rng(4)
    m = np.abs(rng.normal(size=(64, 64)))
    m = (m + m.T) / 2
    assert compute_reproducibility(m, m, transition=True) == pytest.approx(1.0)
    m2 = np.abs(rng.normal(size=(64, 64)))
    m2 = (m2 + m2.T) / 2
    score = compute_reproducibility(m, m2, transition=True)
    assert -1.0 <= score <= 1.0
    # transition rows sum to 1 (except all-zero rows)
    t = to_transition(m)
    np.testing.assert_allclose(t.sum(axis=1), 1.0, atol=1e-9)


def test_genomedisco_matches_reference_formula():
    """1 - |T1^3 - T2^3|.sum() / (0.5 (nnz1+nnz2)) computed directly."""
    rng = np.random.default_rng(5)
    m1 = np.abs(rng.normal(size=(32, 32)))
    m2 = np.abs(rng.normal(size=(32, 32)))
    t1, t2 = to_transition(m1), to_transition(m2)
    rw1 = t1 @ t1 @ t1
    rw2 = t2 @ t2 @ t2
    nz = 0.5 * ((m1.sum(1) > 0).sum() + (m2.sum(1) > 0).sum())
    expected = 1 - np.abs(rw1 - rw2).sum() / nz
    np.testing.assert_allclose(
        compute_reproducibility(m1, m2, True), expected, rtol=1e-10
    )


def test_insulation_loss_matches_torch():
    rng = np.random.default_rng(6)
    out = rng.uniform(0.1, 1, (2, 1, 64, 64)).astype(np.float32)
    tar = rng.uniform(0.1, 1, (2, 1, 64, 64)).astype(np.float32)

    # inline torch ground truth (insulation.py:34-56)
    def torch_dv(x, wr=4, ds=4):
        iv = torch.nn.AvgPool2d(kernel_size=wr, stride=1)(x)
        iv = torch.diagonal(iv, dim1=2, dim2=3)
        iv = torch.log2(iv / torch.mean(iv))
        top = torch.nn.AvgPool1d(ds, 1)(iv[:, :, ds:])
        bottom = torch.nn.AvgPool1d(ds, 1)(iv[:, :, :-ds])
        return top - bottom

    ref = F.mse_loss(
        torch_dv(torch.from_numpy(tar)), torch_dv(torch.from_numpy(out))
    ).item()
    ours = float(
        insulation_loss(
            np.transpose(out, (0, 2, 3, 1)), np.transpose(tar, (0, 2, 3, 1))
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_inverse_data_transform():
    x = np.array([-2.0, -1.0, 0.0, 1.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(inverse_data_transform("rescaled", x)), [0, 0, 0.5, 1, 1]
    )


def test_gds_skip_empty_patch_guard():
    """Reference parity guards only the BATCH sum (stard_metrics.py:175), so
    an empty-target patch scores GDS -1 against any nonzero prediction; the
    opt-in per-patch guard drops exactly those patches."""
    import numpy as np

    from hicdiff_tpu.metrics.harness import MetricAccumulator

    rng = np.random.default_rng(0)
    hr = np.zeros((2, 16, 16, 1), np.float32)
    hr[0] = rng.uniform(0.2, 1.0, (16, 16, 1))  # patch 1 target is empty
    out = np.clip(hr + 0.01 * rng.uniform(size=hr.shape), 0, 1).astype(np.float32)

    parity = MetricAccumulator(quirk_compat=False)
    parity.update(out, hr)
    fixed = MetricAccumulator(quirk_compat=False, gds_skip_empty=True)
    fixed.update(out, hr)
    # parity mode scored both patches (one of them -1); the guard drops the
    # empty one and the mean jumps accordingly
    assert len(parity.batch_lists["gds"]) == 2
    assert len(fixed.batch_lists["gds"]) == 1
    assert min(parity.batch_lists["gds"]) == -1.0
    assert fixed.result()["pas_gds"] > parity.result()["pas_gds"]


def test_build_test_module_percentile_override(tmp_path):
    """Round-5 fix: inference adopts the checkpoint's training percentile.
    The reference silently evaluates cells 1/22 with the population 99.0
    module while train.py preps at single-cell 99.99 (metrics_cond.py:67-77
    vs train.py:14-17) — a normalization-scale break on band-rich data."""
    from hicdiff_tpu.metrics.harness import build_test_module

    dm = build_test_module("Human", 1, "deno", 0.1, root=str(tmp_path),
                           percentile=99.99)
    assert dm.dirname.endswith("_p99.99")
    dm_ref = build_test_module("Human", 1, "deno", 0.1, root=str(tmp_path))
    assert not dm_ref.dirname.endswith("_p99.99")  # reference default, cell 1
    dm_single = build_test_module("Human", 2, "deno", 0.1, root=str(tmp_path))
    # cells 2-6 default to single-cell 99.99 (their reference cache layout
    # carries no marker — 99.99 IS their default)
    assert dm_single.percentile == 99.99
    assert not dm_single.dirname.endswith("_p99.99")
