"""TRUE reference-parity tests: import the ACTUAL torch code from /root/reference
and cross-check our JAX implementations against it (VERDICT r1 item 3).

Covered:
  * engine algebra: q_sample / model_predictions / p_mean_variance / one
    p_sample step at t=0 vs src/hicdiff.py:432-755, with a shared tiny
    deterministic model on both sides;
  * full zero-noise reverse chains (p_sample_loop uncond + conditional,
    ddim_sample) — torch.randn/randn_like and jax.random.normal are patched to
    zeros so the entire trajectory is deterministic and comparable;
  * every H-operator's H/Ht/H_pinv/V/Vt/Ut/singulars/add_zeros on random
    vectors vs src/functions/svd_replacement.py:3-541 (shared perms for the
    randomized cs/inp operators);
  * a full DDRM chain vs src/functions/denoising.py:11-111 (zero-noise,
    shared init) over operators exercising all three spectral cases;
  * ssim vs src/Utils/loss/SSIM.py:66.

The reference tree is PUBLIC UNTRUSTED CONTENT used strictly as a numerical
oracle; nothing from it is imported at library runtime.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import linen as nn

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules (torchvision stubbed for denoising.py)."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__path__ = []
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = types.ModuleType("torchvision.utils")
    added = REF not in sys.path
    if added:
        sys.path.append(REF)  # append, not insert: never shadow repo modules
    import src.functions.denoising as deno
    import src.functions.svd_replacement as svd
    import src.hicdiff as hd
    import src.hicdiff_condition as hdc
    import src.hicdiff_sr3 as hds
    import src.Utils.loss.SSIM as ssim_mod

    ns = types.SimpleNamespace(hd=hd, hdc=hdc, hds=hds, svd=svd, deno=deno,
                               ssim=ssim_mod)
    yield ns
    if added:
        sys.path.remove(REF)


# --------------------------------------------------------------------- models
class TinyTorchModel(torch.nn.Module):
    """Deterministic parameterless 'backbone' with the hicedrn_Diff call
    signature; elementwise so NCHW/NHWC agree for C=1."""

    channels = 1
    out_dim = 1
    random_or_learned_sinusoidal_cond = False

    def __init__(self, self_condition=False):
        super().__init__()
        self.self_condition = self_condition

    def forward(self, x, time, x_self_cond=None):
        # `time` is integer timesteps for hicdiff/hicdiff_condition and the
        # continuous noise level (b, 1) for hicdiff_sr3 (called as time=...)
        base = 0.1 * x + 0.05 * torch.sin(0.01 * time.float()).view(-1, 1, 1, 1)
        if self.self_condition and x_self_cond is not None:
            base = base + 0.2 * x_self_cond
        return base


class TinyJaxModel(nn.Module):
    self_condition: bool = False
    channels: int = 1

    @nn.compact
    def __call__(self, x, t, x_self_cond=None):
        scale = self.param("scale", lambda k: jnp.ones(()))
        base = 0.1 * x + 0.05 * jnp.sin(
            0.01 * t.astype(jnp.float32)
        ).reshape(-1, 1, 1, 1)
        if self.self_condition and x_self_cond is not None:
            base = base + 0.2 * x_self_cond
        return base * scale


def make_pair(ref, *, mode="uncond", self_condition=False, T=40,
              schedule="sigmoid", sampling_timesteps=None, size=16):
    from hicdiff_tpu.diffusion.gaussian import GaussianDiffusion

    ref_mod = ref.hdc if mode == "cond" else ref.hd
    tm = TinyTorchModel(self_condition=self_condition)
    ref_eng = ref_mod.GaussianDiffusion(
        tm, image_size=size, timesteps=T, loss_type="l2",
        beta_schedule=schedule, auto_normalize=False,
        sampling_timesteps=sampling_timesteps,
    )
    jm = TinyJaxModel(self_condition=self_condition)
    eng = GaussianDiffusion.create(
        jm, image_size=size, timesteps=T, loss_type="l2",
        beta_schedule=schedule, auto_normalize=False, mode=mode,
        sampling_timesteps=sampling_timesteps,
    )
    params = eng.init_params(jax.random.PRNGKey(0))
    return ref_eng, eng, params


def nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def zero_noise(monkeypatch):
    """Make both frameworks' samplers noiseless so chains are comparable."""
    monkeypatch.setattr(torch, "randn", lambda *s, **k: torch.zeros(
        *(s[0] if len(s) == 1 and isinstance(s[0], (tuple, list, torch.Size))
          else s)))
    monkeypatch.setattr(torch, "randn_like", lambda x, **k: torch.zeros_like(x))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype),
    )


# ------------------------------------------------------------- engine algebra
def test_q_sample_parity(ref):
    ref_eng, eng, params = make_pair(ref)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.4, (3, 16, 16, 1)).astype(np.float32)
    noise = rng.normal(size=x.shape).astype(np.float32)
    t = np.array([0, 17, 39])
    got = eng.q_sample(jnp.asarray(x), jnp.asarray(t), jnp.asarray(noise))
    want = ref_eng.q_sample(nchw(x), torch.from_numpy(t).long(), nchw(noise))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=1e-6)


@pytest.mark.parametrize("objective", ["pred_noise", "pred_x0", "pred_v"])
def test_model_predictions_parity(ref, objective):
    ref_eng, eng, params = make_pair(ref)
    import dataclasses

    ref_eng.objective = objective
    eng = dataclasses.replace(eng, objective=objective)
    rng = np.random.default_rng(1)
    x = rng.normal(0, 0.7, (2, 16, 16, 1)).astype(np.float32)
    t = np.array([5, 30])
    got = eng.model_predictions(params, jnp.asarray(x), jnp.asarray(t))
    want = ref_eng.model_predictions(nchw(x), torch.from_numpy(t).long())
    np.testing.assert_allclose(
        np.asarray(got.pred_noise), to_nhwc(want.pred_noise), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.pred_x_start), to_nhwc(want.pred_x_start), atol=2e-5
    )


def test_p_mean_variance_parity(ref):
    ref_eng, eng, params = make_pair(ref)
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1.0, (2, 16, 16, 1)).astype(np.float32)
    t = np.array([39, 12])
    mean, var, logvar, x0 = eng.p_mean_variance(
        params, jnp.asarray(x), jnp.asarray(t)
    )
    rmean, rvar, rlogvar, rx0 = ref_eng.p_mean_variance(
        nchw(x), torch.from_numpy(t).long(), clip_denoised=True
    )
    np.testing.assert_allclose(np.asarray(mean), to_nhwc(rmean), atol=2e-6)
    np.testing.assert_allclose(np.asarray(x0), to_nhwc(rx0), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(logvar).ravel(),
        rlogvar.numpy().reshape(2, -1)[:, 0].ravel(), atol=1e-6,
    )


def test_p_sample_step_t0_parity(ref):
    """t=0 is noiseless in both engines (hicdiff.py:599) — exact one-step
    parity with no RNG involved."""
    ref_eng, eng, params = make_pair(ref)
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1.0, (2, 16, 16, 1)).astype(np.float32)
    img, x0 = eng.p_sample_step(params, jax.random.PRNGKey(0), jnp.asarray(x), 0)
    rimg, rx0 = ref_eng.p_sample(nchw(x), 0)
    np.testing.assert_allclose(np.asarray(img), to_nhwc(rimg), atol=2e-6)
    np.testing.assert_allclose(np.asarray(x0), to_nhwc(rx0), atol=2e-6)


# ------------------------------------------------------------ full chains
def test_p_sample_loop_uncond_trajectory_parity(ref, monkeypatch):
    zero_noise(monkeypatch)
    ref_eng, eng, params = make_pair(ref, T=25)
    want = ref_eng.p_sample_loop((2, 1, 16, 16))
    got = eng.p_sample_loop(params, jax.random.PRNGKey(0), (2, 16, 16, 1))
    # zero init + zero step noise -> identical deterministic trajectories
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=3e-5)


def test_p_sample_loop_conditional_trajectory_parity(ref, monkeypatch):
    """Conditional chain: the noisy input is the persistent self-cond
    (hicdiff_condition.py:601-623)."""
    zero_noise(monkeypatch)
    ref_eng, eng, params = make_pair(ref, mode="cond", self_condition=True,
                                     T=25)
    rng = np.random.default_rng(4)
    cond = np.clip(rng.normal(0, 0.4, (2, 16, 16, 1)), -1, 1).astype(np.float32)
    want = ref_eng.super_resolution(nchw(cond))
    got = eng.super_resolution(params, jax.random.PRNGKey(0), jnp.asarray(cond))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=3e-5)


def test_ddim_trajectory_parity(ref, monkeypatch):
    zero_noise(monkeypatch)
    ref_eng, eng, params = make_pair(ref, T=40, sampling_timesteps=10)
    want = ref_eng.ddim_sample((2, 1, 16, 16))
    got = eng.ddim_sample(params, jax.random.PRNGKey(0), (2, 16, 16, 1))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=3e-5)


# ------------------------------------------------------------- H operators
def _ref_operator(ref, deg, size, rng, channels=1):
    """Instantiate the reference operator, sharing randomness with ours."""
    svd = ref.svd
    if deg == "deno":
        return svd.Denoising(1, size, None)
    if deg == "sr2":
        return svd.SuperResolution(1, size, 2, None)
    if deg == "sr4":
        return svd.SuperResolution(1, size, 4, None)
    if deg == "sr_bicubic4":
        from hicdiff_tpu.degrade.operators import _bicubic_kernel

        k = np.zeros(16)
        for i in range(16):
            x = (1 / 4) * (i - np.floor(16 / 2) + 0.5)
            k[i] = _bicubic_kernel(x)
        k = k / k.sum()
        return svd.SRConv(torch.from_numpy(k).float(), channels, size, None,
                          stride=4)
    if deg == "deblur_uni":
        return svd.Deblurring(torch.full((9,), 1 / 9.0), 1, size, None)
    if deg == "deblur_gauss":
        kernel = np.exp(-0.5 * (np.array([-2, -1, 0, 1, 2]) / 10.0) ** 2)
        kernel = torch.from_numpy(kernel / kernel.sum()).float()
        return svd.Deblurring(kernel, 1, size, None)
    if deg == "deblur_aniso":
        x = np.arange(-4, 5, dtype=np.float64)
        k2 = np.exp(-0.5 * (x / 20.0) ** 2)
        k1 = np.exp(-0.5 * (x / 1.0) ** 2)
        return svd.Deblurring2D(
            torch.from_numpy(k1 / k1.sum()).float(),
            torch.from_numpy(k2 / k2.sum()).float(), 1, size, None,
        )
    if deg == "inp_mask":
        missing = np.sort(rng.permutation(size**2)[: size**2 // 2])
        return svd.Inpainting(1, size, torch.from_numpy(missing).long(), None)
    if deg == "cs4":
        perm = rng.permutation(size**2)
        return svd.WalshHadamardCS(1, size, 4, torch.from_numpy(perm).long(),
                                   None)
    if deg == "color":
        return svd.Colorization(size, None)
    raise ValueError(deg)


# Operators whose SVD is exactly reproducible (identity, patch-average,
# permutation/Hadamard, channel-mix): every map must match elementwise.
EXACT_DEGS = ["deno", "sr2", "sr4", "inp_mask", "cs4", "color"]
# Convolution-family operators SVD an ill-conditioned 1-D blur matrix with
# near-degenerate singular clusters; torch's and numpy's LAPACK drivers pick
# different (equally valid) bases inside those clusters, so elementwise V/Vt
# parity is driver-dependent. We check singulars exactly, H/Ht to the
# truncation-cluster tolerance, and internal SVD consistency instead.
CONV_DEGS = ["sr_bicubic4", "deblur_uni", "deblur_gauss", "deblur_aniso"]


@pytest.mark.parametrize("deg", EXACT_DEGS)
def test_operator_parity(ref, deg):
    """H/Ht/H_pinv/V/Vt/Ut/singulars/add_zeros on random vectors vs the
    reference SVD objects (svd_replacement.py). Vectors are channel-major
    flats, the layout both sides use."""
    from hicdiff_tpu.degrade.operators import make_operator

    size = 16
    channels = 3 if deg == "color" else 1
    # shared randomness: our factory and _ref_operator draw from the same seed
    ours = make_operator(deg, image_channel=channels, image_size=size,
                         rng=np.random.default_rng(42))
    theirs = _ref_operator(ref, deg, size, np.random.default_rng(42))

    rng = np.random.default_rng(7)
    d = channels * size * size
    x = rng.normal(size=(2, d)).astype(np.float32)
    tx = torch.from_numpy(x)

    s_ours = np.asarray(ours.singulars())
    s_ref = theirs.singulars().numpy()
    np.testing.assert_allclose(s_ours, s_ref, atol=1e-5)

    def cmp(name, a, b, atol=2e-5):
        np.testing.assert_allclose(
            np.asarray(a), b.numpy().reshape(b.shape[0], -1), atol=atol,
            err_msg=f"{deg}.{name}",
        )

    cmp("V", ours.V(jnp.asarray(x)), theirs.V(tx))
    cmp("Vt", ours.Vt(jnp.asarray(x)), theirs.Vt(tx))
    cmp("H", ours.H(jnp.asarray(x)), theirs.H(tx))

    m = s_ref.shape[0]
    y = rng.normal(size=(2, int(ours.H(jnp.asarray(x)).shape[1]))).astype(
        np.float32
    )
    cmp("Ut", ours.Ut(jnp.asarray(y)), theirs.Ut(torch.from_numpy(y)))
    cmp("Ht", ours.Ht(jnp.asarray(y)), theirs.Ht(torch.from_numpy(y)))
    # H_pinv: guard zero singulars the same way the comparison demands — the
    # reference divides by singulars (inf on zeros never reaches the output
    # for these operators because add_zeros masks them)
    if np.all(s_ref > 1e-8) or deg in ("inp_mask", "cs4", "color", "sr2",
                                       "sr4"):
        cmp("H_pinv", ours.H_pinv(jnp.asarray(y)),
            theirs.H_pinv(torch.from_numpy(y)), atol=1e-4)
    zhead = rng.normal(size=(2, m)).astype(np.float32)
    cmp("add_zeros", ours.add_zeros(jnp.asarray(zhead)),
        theirs.add_zeros(torch.from_numpy(zhead)))


@pytest.mark.parametrize("deg", CONV_DEGS)
def test_operator_parity_conv_family(ref, deg):
    """Convolution-family operators: exact singular values, H/Ht within the
    near-degenerate-cluster tolerance, and SVD self-consistency (V orthogonal,
    H == U.S.Vt composition). See CONV_DEGS comment for why elementwise V/Vt
    parity is not well-defined across LAPACK drivers."""
    from hicdiff_tpu.degrade.operators import SRConv, _bicubic_kernel

    size = 16
    # sr_bicubic: the reference hard-codes repeat_interleave(3) in singulars()
    # (svd_replacement.py:384-385) — only channels=3 is self-consistent there
    channels = 3 if deg == "sr_bicubic4" else 1
    if deg == "sr_bicubic4":
        k = np.zeros(16)
        for i in range(16):
            k[i] = _bicubic_kernel((1 / 4) * (i - np.floor(16 / 2) + 0.5))
        k = k / k.sum()
        ours = SRConv(k, channels, size, stride=4)
    else:
        from hicdiff_tpu.degrade.operators import make_operator

        ours = make_operator(deg, image_channel=channels, image_size=size,
                             rng=np.random.default_rng(42))
    theirs = _ref_operator(ref, deg, size, np.random.default_rng(42),
                           channels=channels)

    s_ours = np.asarray(ours.singulars())
    s_ref = theirs.singulars().numpy()
    np.testing.assert_allclose(s_ours, s_ref, atol=1e-5)

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, channels * size * size)).astype(np.float32)
    Ho = np.asarray(ours.H(jnp.asarray(x)))
    Hr = theirs.H(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(Ho, Hr.reshape(Hr.shape[0], -1), atol=5e-3)
    y = rng.normal(size=(2, Ho.shape[1])).astype(np.float32)
    Hto = np.asarray(ours.Ht(jnp.asarray(y)))
    Htr = theirs.Ht(torch.from_numpy(y)).numpy()
    np.testing.assert_allclose(Hto, Htr.reshape(Htr.shape[0], -1), atol=5e-3)

    # internal consistency: V orthogonal, H == U diag(s) Vt
    vvt = np.asarray(ours.V(ours.Vt(jnp.asarray(x))))
    np.testing.assert_allclose(vvt, x, atol=1e-4)
    s = np.asarray(ours.singulars())
    comp = np.asarray(
        ours.U(s * np.asarray(ours.Vt(jnp.asarray(x)))[:, : s.shape[0]])
    )
    np.testing.assert_allclose(comp, Ho, atol=1e-4)


# ------------------------------------------------------------------- DDRM
@pytest.mark.parametrize("deg", ["deno", "inp_mask", "sr2"])
def test_ddrm_chain_parity(ref, monkeypatch, deg):
    """Full DDRM chain vs efficient_generalized_steps (denoising.py:11-111),
    zero-noise, shared init — exercises all three spectral cases (deno: A+B,
    inp: C/unobserved + A+B on kept pixels, sr2: dimension reduction).
    deblur_* is excluded: its DDRM masks split near-degenerate singular
    clusters whose basis is LAPACK-driver-dependent (see CONV_DEGS), so exact
    trajectory parity is not well-defined."""
    zero_noise(monkeypatch)
    from hicdiff_tpu.degrade.operators import make_operator
    from hicdiff_tpu.sampling.ddrm import efficient_generalized_steps

    size = 16
    ours_h = make_operator(deg, image_channel=1, image_size=size,
                           rng=np.random.default_rng(42))
    ref_h = _ref_operator(ref, deg, size, np.random.default_rng(42))

    T = 20
    betas = np.linspace(1e-4, 2e-2, T).astype(np.float32)
    seq = list(range(0, T, 2))
    rng = np.random.default_rng(9)
    x_init = rng.normal(size=(2, size, size, 1)).astype(np.float32)
    clean = np.clip(rng.normal(0, 0.4, (2, size * size)), -1, 1).astype(
        np.float32
    )
    y0 = np.asarray(ref_h.H(torch.from_numpy(clean)))  # shared measurement
    sigma_0 = 0.3

    def jax_model(x, t):
        return 0.1 * x + 0.05 * jnp.sin(
            0.01 * t.astype(jnp.float32)
        ).reshape(-1, 1, 1, 1)

    def torch_model(x, t):
        return 0.1 * x + 0.05 * torch.sin(0.01 * t.float()).view(-1, 1, 1, 1)

    got_x, got_x0 = efficient_generalized_steps(
        jax.random.PRNGKey(0), jnp.asarray(x_init), seq, jax_model,
        jnp.asarray(betas), ours_h, jnp.asarray(y0), sigma_0,
        etaB=1.0, etaA=0.85, etaC=0.85,
    )
    xs, x0_preds = ref.deno.efficient_generalized_steps(
        nchw(x_init), seq, torch_model, torch.from_numpy(betas), ref_h,
        torch.from_numpy(y0), sigma_0, etaB=1.0, etaA=0.85, etaC=0.85,
    )
    np.testing.assert_allclose(
        np.asarray(got_x), to_nhwc(xs[-1]), atol=5e-5, err_msg=f"{deg} x"
    )
    np.testing.assert_allclose(
        np.asarray(got_x0), to_nhwc(x0_preds[-1]), atol=5e-5,
        err_msg=f"{deg} x0",
    )


# ------------------------------------------------------------------- SSIM
def test_ssim_parity(ref):
    from hicdiff_tpu.metrics.image import ssim

    rng = np.random.default_rng(11)
    a = rng.random((3, 32, 32, 1)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.normal(size=a.shape), 0, 1).astype(np.float32)
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    want = float(ref.ssim.ssim(nchw(a), nchw(b)))
    assert abs(got - want) < 1e-5
    got_per = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b),
                              size_average=False))
    want_per = ref.ssim.ssim(nchw(a), nchw(b), size_average=False).numpy()
    np.testing.assert_allclose(got_per, want_per, atol=1e-5)


def test_interpolate_parity(ref, monkeypatch):
    """engine.interpolate vs src/hicdiff.py:674-692 (zero-noise: q_sample is
    the deterministic sqrt(acp)*x and the reverse loop from t-1 matches)."""
    zero_noise(monkeypatch)
    ref_eng, eng, params = make_pair(ref, T=25)
    rng = np.random.default_rng(7)
    x1 = np.clip(rng.normal(0, 0.4, (2, 16, 16, 1)), -1, 1).astype(np.float32)
    x2 = np.clip(rng.normal(0, 0.4, (2, 16, 16, 1)), -1, 1).astype(np.float32)
    want = ref_eng.interpolate(nchw(x1), nchw(x2), t=12, lam=0.3)
    got = eng.interpolate(
        params, jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2),
        t=12, lam=0.3,
    )
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=3e-5)


def test_sr3_p_sample_loop_parity(ref, monkeypatch):
    """SR3 engine reverse chain vs src/hicdiff_sr3.py:633-680: scalar-t buffer
    indexing, the noise-level tensor sqrt_alphas_cumprod_prev[t+1] fed to the
    model, and the conditional (persistent self-cond) loop."""
    from hicdiff_tpu.diffusion.gaussian import GaussianDiffusion

    zero_noise(monkeypatch)
    T = 20
    tm = TinyTorchModel(self_condition=True)
    ref_eng = ref.hds.GaussianDiffusion(
        tm, image_size=16, timesteps=T, loss_type="l2",
        beta_schedule="linear", auto_normalize=False,
    )
    jm = TinyJaxModel(self_condition=True)
    eng = GaussianDiffusion.create(
        jm, image_size=16, timesteps=T, loss_type="l2",
        beta_schedule="linear", auto_normalize=False, mode="sr3",
    )
    params = eng.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(9)
    cond = np.clip(rng.normal(0, 0.4, (2, 16, 16, 1)), -1, 1).astype(np.float32)
    want = ref_eng.p_sample_loop(nchw(cond))
    got = eng.super_resolution(params, jax.random.PRNGKey(0), jnp.asarray(cond))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=3e-5)


def test_1d_sample_loop_parity(ref, monkeypatch):
    """1-D engine chain vs src/hicdiff_1d.py GaussianDiffusion1D:568-622
    (zero-noise, cosine schedule, NCL vs NLC layouts)."""
    import src.hicdiff_1d as hd1

    from hicdiff_tpu.diffusion.gaussian import GaussianDiffusion

    zero_noise(monkeypatch)

    class TinyTorch1D(torch.nn.Module):
        channels = 1
        self_condition = False

        def forward(self, x, time, x_self_cond=None):
            return 0.1 * x + 0.05 * torch.sin(0.01 * time.float()).view(-1, 1, 1)

    class TinyJax1D(nn.Module):
        self_condition: bool = False
        channels: int = 1

        @nn.compact
        def __call__(self, x, t, x_self_cond=None):
            scale = self.param("scale", lambda k: jnp.ones(()))
            return scale * (
                0.1 * x
                + 0.05 * jnp.sin(0.01 * t.astype(jnp.float32)).reshape(-1, 1, 1)
            )

    T = 20
    ref_eng = hd1.GaussianDiffusion1D(
        TinyTorch1D(), seq_length=16, timesteps=T, loss_type="l2",
        beta_schedule="cosine", auto_normalize=False,
    )
    eng = GaussianDiffusion.create(
        TinyJax1D(), image_size=16, seq_length=16, timesteps=T,
        loss_type="l2", beta_schedule="cosine", mode="uncond",
    )
    params = eng.init_params(jax.random.PRNGKey(0))
    want = ref_eng.sample(batch_size=2)  # (2, 1, 16) NCL
    got = eng.sample(params, jax.random.PRNGKey(0), batch_size=2)  # (2, 16, 1)
    np.testing.assert_allclose(
        np.asarray(got)[..., 0], want.detach().numpy()[:, 0, :], atol=3e-5
    )
