"""Activation-parity tests for the baseline generators vs the ACTUAL torch
reference models (src/model/{hicplus,deephic,hicsr,schicedrn_gan,Unet_parts1}
.py) — the same weights produce the same outputs, so checkpoints trained by
either implementation are interchangeable in spirit (the §2.4 parity evidence
the hicedrn backbone already has via test_torch_convert).

Weight mapping: torch Conv2d OIHW -> flax HWIO (transpose 2,3,1,0); torch
ConvTranspose2d (in,out,kh,kw) -> spatial flip + transpose(2,3,0,1) (verified
against torch: flax lax.conv_transpose does not mirror the kernel); BatchNorm
weight/bias/running_{mean,var} -> scale/bias + batch_stats (eval mode both
sides). The reference tree is PUBLIC UNTRUSTED CONTENT used strictly as a
numerical oracle; nothing from it is imported at library runtime.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src", "model")),
    reason="reference tree not present",
)


@pytest.fixture(scope="module")
def refmod():
    added = REF not in sys.path
    if added:
        sys.path.append(REF)  # append, not insert: never shadow repo modules
    import src.model.deephic as deephic
    import src.model.hicplus as hicplus
    import src.model.hicsr as hicsr
    import src.model.schicedrn_gan as schicedrn
    import src.model.Unet_parts1 as unet_parts

    import types

    ns = types.SimpleNamespace(
        hicplus=hicplus, deephic=deephic, hicsr=hicsr,
        schicedrn=schicedrn, unet_parts=unet_parts,
    )
    yield ns
    if added:
        sys.path.remove(REF)


def k(w):
    """torch Conv2d weight -> flax kernel."""
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def kt(w):
    """torch ConvTranspose2d weight -> flax ConvTranspose kernel."""
    return jnp.asarray(
        w.detach().numpy()[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
    )


def b(t):
    return jnp.asarray(t.detach().numpy())


def conv2d(mod):
    """Our Conv2d wrapper's subtree from a torch Conv2d."""
    return {"Conv_0": {"kernel": k(mod.weight), "bias": b(mod.bias)}}


def bn_params(mod):
    return {"scale": b(mod.weight), "bias": b(mod.bias)}


def bn_stats(mod):
    return {"mean": b(mod.running_mean), "var": b(mod.running_var)}


def _randomize_bn_stats(tm, seed=0):
    """Non-trivial running stats so eval-mode BN parity is actually exercised
    (fresh stats are mean 0 / var 1, which a wrong mapping could satisfy)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(
                    0.3 * torch.randn(m.running_mean.shape, generator=g)
                )
                m.running_var.copy_(
                    1.0 + 0.5 * torch.rand(m.running_var.shape, generator=g)
                )


def _compare(tm, model, variables, size, atol, batch=2, seed=0):
    tm.eval()
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (batch, 1, size, size)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    out = np.asarray(
        model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=0, atol=atol)


def test_hicplus_parity(refmod):
    """hicplus.py:18-35 (3 unpadded convs + relu)."""
    from hicdiff_tpu.models.baselines import HicPlus

    tm = refmod.hicplus.Net(40, 28)
    variables = {"params": {
        "Conv2d_0": conv2d(tm.conv1),
        "Conv2d_1": conv2d(tm.conv2),
        "Conv2d_2": conv2d(tm.conv3),
    }}
    _compare(tm, HicPlus(), variables, 76, atol=2e-6)


def test_hiedsr_generator_parity(refmod):
    """schicedrn_gan.py:26-62 (head, 32 shared-conv res blocks x0.1, body
    tail, global residual, tail)."""
    from hicdiff_tpu.models.hicedrn import HicedrnGenerator

    tm = refmod.schicedrn.Generator()
    params = {"Conv2d_0": conv2d(tm.head)}
    for i in range(32):
        params[f"Conv2d_{i + 1}"] = conv2d(tm.body[i].res_conv)
    params["Conv2d_33"] = conv2d(tm.body[32])
    params["Conv2d_34"] = conv2d(tm.tail)
    # 256-feat 3x3 convs x ~66 applications accumulate fp32 reduction noise
    _compare(tm, HicedrnGenerator(), {"params": params}, 64, atol=5e-4)


def test_deephic_parity(refmod):
    """deephic.py:25-45 (swish/BN res blocks, (tanh+1)/2 head) in eval mode
    with non-trivial running stats."""
    from hicdiff_tpu.models.baselines import DeepHiC

    tm = refmod.deephic.Generator(scale_factor=1, in_channel=1, resblock_num=5)
    _randomize_bn_stats(tm)
    params = {"Conv2d_0": conv2d(tm.conv1)}
    stats = {}
    for i, blk in enumerate(tm.resblocks):
        params[f"_BNResBlock_{i}"] = {
            "Conv2d_0": conv2d(blk.conv1),
            "Conv2d_1": conv2d(blk.conv2),
            "BatchNorm_0": bn_params(blk.bn1),
            "BatchNorm_1": bn_params(blk.bn2),
        }
        stats[f"_BNResBlock_{i}"] = {
            "BatchNorm_0": bn_stats(blk.bn1),
            "BatchNorm_1": bn_stats(blk.bn2),
        }
    params["Conv2d_1"] = conv2d(tm.conv2)
    params["BatchNorm_0"] = bn_params(tm.bn2)
    stats["BatchNorm_0"] = bn_stats(tm.bn2)
    params["Conv2d_2"] = conv2d(tm.conv3)
    _compare(tm, DeepHiC(), {"params": params, "batch_stats": stats}, 64,
             atol=1e-5)


def test_hicsr_parity(refmod):
    """hicsr.py:23-61 (unpadded pre/final stacks, 15 BN res blocks, tanh)."""
    from hicdiff_tpu.models.baselines import HiCSR

    tm = refmod.hicsr.Generator(num_res_blocks=15)
    _randomize_bn_stats(tm)
    params = {"Conv2d_0": conv2d(tm.pre_res_block[0])}
    stats = {}
    for i, blk in enumerate(tm.res_blocks):
        params[f"Conv2d_{2 * i + 1}"] = conv2d(blk.conv1)
        params[f"Conv2d_{2 * i + 2}"] = conv2d(blk.conv2)
        params[f"BatchNorm_{2 * i}"] = bn_params(blk.bn1)
        params[f"BatchNorm_{2 * i + 1}"] = bn_params(blk.bn2)
        stats[f"BatchNorm_{2 * i}"] = bn_stats(blk.bn1)
        stats[f"BatchNorm_{2 * i + 1}"] = bn_stats(blk.bn2)
    params["Conv2d_31"] = conv2d(tm.post_res_block[0])
    params["BatchNorm_30"] = bn_params(tm.post_res_block[1])
    stats["BatchNorm_30"] = bn_stats(tm.post_res_block[1])
    for j in range(5):
        params[f"Conv2d_{32 + j}"] = conv2d(tm.final_block[j])
    _compare(tm, HiCSR(), {"params": params, "batch_stats": stats}, 76,
             atol=1e-5)


def test_unet2d_parity(refmod):
    """Unet_parts1.py:154-227 (4-level unet, deconv ups, sigmoid) incl. the
    ConvTranspose kernel-flip mapping."""
    from hicdiff_tpu.models.baselines import Unet2D

    tm = refmod.unet_parts.unet_2D()
    _randomize_bn_stats(tm)
    n_torch = sum(p.numel() for p in tm.parameters())

    def dconv(u):
        seq = u.double_conv
        return (
            {
                "Conv_0": {"kernel": k(seq[0].weight)},
                "BatchNorm_0": bn_params(seq[1]),
                "Conv_1": {"kernel": k(seq[3].weight)},
                "BatchNorm_1": bn_params(seq[4]),
            },
            {"BatchNorm_0": bn_stats(seq[1]), "BatchNorm_1": bn_stats(seq[4])},
        )

    params, stats = {}, {}
    downs = [tm.conv1, tm.conv2, tm.conv3, tm.conv4, tm.center]
    for i, m in enumerate(downs):
        params[f"_DoubleConv_{i}"], stats[f"_DoubleConv_{i}"] = dconv(m)
    ups = [tm.up_concat4, tm.up_concat3, tm.up_concat2, tm.up_concat1]
    for i, u in enumerate(ups):
        params[f"ConvTranspose_{i}"] = {
            "kernel": kt(u.up.weight), "bias": b(u.up.bias),
        }
        (params[f"_DoubleConv_{5 + i}"],
         stats[f"_DoubleConv_{5 + i}"]) = dconv(u.conv)
    params["Conv_0"] = {"kernel": k(tm.final.weight), "bias": b(tm.final.bias)}

    model = Unet2D()
    variables = {"params": params, "batch_stats": stats}
    n_flax = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert n_flax == n_torch, (n_flax, n_torch)
    _compare(tm, model, variables, 64, atol=1e-5)


def test_dae_parity(refmod):
    """DAE_model.py:7-50 (strided conv down, deconv up, interleaved skip
    adds, input residual, tanh) — backs the fe_rec_loss feature net."""
    import src.model.DAE_model as dae_mod

    from hicdiff_tpu.models.baselines import DAE

    tm = dae_mod.DAE(num_layers=5, num_features=64)
    params = {"Conv_0": {"kernel": k(tm.conv_layers[0][0].weight),
                         "bias": b(tm.conv_layers[0][0].bias)}}
    for i in range(4):
        params[f"Conv2d_{i}"] = conv2d(tm.conv_layers[i + 1][0])
    for i in range(4):
        params[f"ConvTranspose_{i}"] = {
            "kernel": kt(tm.deconv_layers[i][0].weight),
            "bias": b(tm.deconv_layers[i][0].bias),
        }
    params["ConvTranspose_4"] = {
        "kernel": kt(tm.deconv_layers[4].weight),
        "bias": b(tm.deconv_layers[4].bias),
    }
    _compare(tm, DAE(), {"params": params}, 64, atol=1e-5)


def test_deephic_discriminator_parity(refmod):
    """deephic.py:47-78 (swish FCN discriminator, global avgpool head)."""
    from hicdiff_tpu.models.baselines import DeepHiCDiscriminator

    tm = refmod.deephic.Discriminator(in_channel=1)
    _randomize_bn_stats(tm)
    params = {
        "Conv2d_0": conv2d(tm.conv1),
        "Conv_0": {"kernel": k(tm.conv2.weight), "bias": b(tm.conv2.bias)},
        "BatchNorm_0": bn_params(tm.bn2),
        "Conv2d_1": conv2d(tm.conv3),
        "BatchNorm_1": bn_params(tm.bn3),
        "Conv_1": {"kernel": k(tm.conv4.weight), "bias": b(tm.conv4.bias)},
        "BatchNorm_2": bn_params(tm.bn4),
        "Conv2d_2": conv2d(tm.conv5),
        "BatchNorm_3": bn_params(tm.bn5),
        "Conv_2": {"kernel": k(tm.conv6.weight), "bias": b(tm.conv6.bias)},
        "BatchNorm_4": bn_params(tm.bn6),
        "Conv2d_3": conv2d(tm.conv7),
    }
    stats = {
        "BatchNorm_0": bn_stats(tm.bn2), "BatchNorm_1": bn_stats(tm.bn3),
        "BatchNorm_2": bn_stats(tm.bn4), "BatchNorm_3": bn_stats(tm.bn5),
        "BatchNorm_4": bn_stats(tm.bn6),
    }
    tm.eval()
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (2, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    from hicdiff_tpu.models.baselines import DeepHiCDiscriminator

    out = np.asarray(DeepHiCDiscriminator().apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    ))
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)


def test_hicsr_discriminator_parity(refmod):
    """hicsr.py:64-95 (strided 4x4 LeakyReLU 0.2 patch discriminator)."""
    from hicdiff_tpu.models.baselines import HiCSRDiscriminator

    tm = refmod.hicsr.Discriminator()
    _randomize_bn_stats(tm)
    seq = tm.conv
    params = {
        "Conv_0": {"kernel": k(seq[0].weight)},
        "Conv_1": {"kernel": k(seq[2].weight)},
        "BatchNorm_0": bn_params(seq[3]),
        "Conv_2": {"kernel": k(seq[5].weight)},
        "BatchNorm_1": bn_params(seq[6]),
        "Conv_3": {"kernel": k(seq[8].weight)},
        "BatchNorm_2": bn_params(seq[9]),
        "Conv_4": {"kernel": k(seq[11].weight)},
    }
    stats = {"BatchNorm_0": bn_stats(seq[3]), "BatchNorm_1": bn_stats(seq[6]),
             "BatchNorm_2": bn_stats(seq[9])}
    _compare(tm, HiCSRDiscriminator(),
             {"params": params, "batch_stats": stats}, 64, atol=1e-5)


def test_hiedsr_discriminator_parity(refmod):
    """schicedrn_gan.py:65-99 (8-stage conv-bn-lrelu patch discriminator,
    sigmoid map; first lrelu is torch's default 0.01 slope)."""
    from hicdiff_tpu.models.baselines import HiedsrDiscriminator

    tm = refmod.schicedrn.Discriminator()
    _randomize_bn_stats(tm)
    body = tm.body
    params = {"Conv2d_0": conv2d(body[0]),
              "Conv2d_1": conv2d(body[9])}
    stats = {}
    for i in range(7):
        cbl = body[2 + i]
        params[f"Conv_{i}"] = {"kernel": k(cbl[0].weight)}
        params[f"BatchNorm_{i}"] = bn_params(cbl[1])
        stats[f"BatchNorm_{i}"] = bn_stats(cbl[1])
    _compare(tm, HiedsrDiscriminator(),
             {"params": params, "batch_stats": stats}, 64, atol=1e-5)
