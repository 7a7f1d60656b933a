"""Degradation operators ("H functions") as pure-JAX spectral linear operators.

Re-design of /root/reference/src/functions/svd_replacement.py and H_func.py:4-68.
Each operator exposes the SVD of a degradation matrix H = U diag(s) V^T through
matrix-free maps V/Vt/U/Ut plus the singular-value vector, which is exactly the
interface the DDRM sampler needs (src/functions/denoising.py) and the noise-
injection prep stage uses (processdata/PrepareData_linear.py:199-207).

All maps take (B, ...) arrays, flatten trailing dims, and return (B, D'). Small
SVDs are computed on the host in float64 numpy at construction (deterministic),
then held as fp32 jnp constants; every map is jit-able and runs on TPU. Images are
treated as channel-major (B, C, H, W) when flattened — with C=1 (the live Hi-C
path) that equals NHWC flattening.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "HFunction",
    "Denoising",
    "Inpainting",
    "SuperResolution",
    "SRConv",
    "Deblurring",
    "Deblurring2D",
    "WalshHadamardCS",
    "Colorization",
    "GeneralH",
    "make_operator",
]


def _flat(vec):
    return vec.reshape(vec.shape[0], -1)


class HFunction:
    """Abstract SVD-backed degradation operator (svd_replacement.py:3-70)."""

    def V(self, vec):
        raise NotImplementedError

    def Vt(self, vec):
        raise NotImplementedError

    def U(self, vec):
        raise NotImplementedError

    def Ut(self, vec):
        raise NotImplementedError

    def singulars(self):
        raise NotImplementedError

    def add_zeros(self, vec):
        raise NotImplementedError

    def H(self, vec):
        temp = self.Vt(vec)
        singulars = self.singulars()
        return self.U(singulars * temp[:, : singulars.shape[0]])

    def Ht(self, vec):
        temp = self.Ut(vec)
        singulars = self.singulars()
        return self.V(self.add_zeros(singulars * temp[:, : singulars.shape[0]]))

    def H_pinv(self, vec):
        temp = self.Ut(vec)
        singulars = self.singulars()
        # zero-singular entries stay zero (reference divides then relies on the
        # caller; we guard to avoid inf propagating on TPU)
        inv = jnp.where(singulars != 0, 1.0 / jnp.where(singulars == 0, 1.0, singulars), 0.0)
        head = temp[:, : singulars.shape[0]] * inv
        temp = jnp.concatenate([head, temp[:, singulars.shape[0] :]], axis=1)
        return self.V(self.add_zeros(temp))


class Denoising(HFunction):
    """Identity degradation — the live 'deno' path (svd_replacement.py:148-168)."""

    def __init__(self, channels: int, img_dim: int):
        self._singulars = jnp.ones(channels * img_dim**2, dtype=jnp.float32)

    def V(self, vec):
        return _flat(vec)

    Vt = V
    U = V
    Ut = V
    add_zeros = staticmethod(_flat)

    def singulars(self):
        return self._singulars


class Inpainting(HFunction):
    """Masked-pixel degradation (svd_replacement.py:110-146)."""

    def __init__(self, channels: int, img_dim: int, missing_indices):
        self.channels = channels
        self.img_dim = img_dim
        missing = np.asarray(missing_indices, dtype=np.int64)
        total = channels * img_dim**2
        kept = np.setdiff1d(np.arange(total), missing, assume_unique=False)
        self.missing_indices = jnp.asarray(missing)
        self.kept_indices = jnp.asarray(kept)
        self._singulars = jnp.ones(total - missing.shape[0], dtype=jnp.float32)
        # scatter permutation: out[perm[i]] = in[i]
        perm = np.concatenate([kept, missing])
        self._perm = jnp.asarray(perm)
        self._inv_perm = jnp.asarray(np.argsort(perm))

    def V(self, vec):
        temp = _flat(vec)
        out = temp[:, self._inv_perm]
        b = vec.shape[0]
        # reference reorders to channel-major: reshape(-1, C).permute -> (C, ...)
        return out.reshape(b, -1, self.channels).swapaxes(1, 2).reshape(b, -1)

    def Vt(self, vec):
        b = vec.shape[0]
        temp = (
            _flat(vec).reshape(b, self.channels, -1).swapaxes(1, 2).reshape(b, -1)
        )
        return temp[:, self._perm]

    def U(self, vec):
        return _flat(vec)

    Ut = U

    def singulars(self):
        return self._singulars

    def add_zeros(self, vec):
        temp = _flat(vec)
        pad = self.channels * self.img_dim**2 - temp.shape[1]
        return jnp.pad(temp, ((0, 0), (0, pad)))


class SuperResolution(HFunction):
    """Patch-average downsampling SVD (svd_replacement.py:171-226)."""

    def __init__(self, channels: int, img_dim: int, ratio: int):
        assert img_dim % ratio == 0
        self.img_dim = img_dim
        self.channels = channels
        self.y_dim = img_dim // ratio
        self.ratio = ratio
        H = np.full((1, ratio**2), 1.0 / ratio**2, dtype=np.float64)
        U, s, Vh = np.linalg.svd(H, full_matrices=True)
        self.U_small = jnp.asarray(U, dtype=jnp.float32)  # (1,1)
        self.singulars_small = jnp.asarray(s, dtype=jnp.float32)  # (1,)
        self.V_small = jnp.asarray(Vh.T, dtype=jnp.float32)  # (r^2, r^2)

    def _to_patches(self, vec):
        """(B, C*H*W) -> (B, C, y_dim^2, r^2) extracting r x r patches."""
        b = vec.shape[0]
        r, y = self.ratio, self.y_dim
        img = _flat(vec).reshape(b, self.channels, self.img_dim, self.img_dim)
        img = img.reshape(b, self.channels, y, r, y, r)
        return img.transpose(0, 1, 2, 4, 3, 5).reshape(b, self.channels, y * y, r * r)

    def _from_patches(self, patches):
        b = patches.shape[0]
        r, y = self.ratio, self.y_dim
        img = patches.reshape(b, self.channels, y, y, r, r)
        img = img.transpose(0, 1, 2, 4, 3, 5)
        return img.reshape(b, self.channels * self.img_dim**2)

    def _reorder_in(self, vec):
        """Undo the descending-singular ordering: first y^2*C entries are patch
        coefficient 0, the rest interleave coefficients 1..r^2-1."""
        b = vec.shape[0]
        temp = _flat(vec)
        n0 = self.channels * self.y_dim**2
        patches = jnp.zeros(
            (b, self.channels, self.y_dim**2, self.ratio**2), dtype=vec.dtype
        )
        patches = patches.at[:, :, :, 0].set(
            temp[:, :n0].reshape(b, self.channels, -1)
        )
        for idx in range(self.ratio**2 - 1):
            patches = patches.at[:, :, :, idx + 1].set(
                temp[:, (n0 + idx) :: self.ratio**2 - 1].reshape(b, self.channels, -1)
            )
        return patches

    def _reorder_out(self, patches):
        b = patches.shape[0]
        n0 = self.channels * self.y_dim**2
        out = jnp.zeros(
            (b, self.channels * self.img_dim**2), dtype=patches.dtype
        )
        out = out.at[:, :n0].set(patches[:, :, :, 0].reshape(b, n0))
        for idx in range(self.ratio**2 - 1):
            out = out.at[:, (n0 + idx) :: self.ratio**2 - 1].set(
                patches[:, :, :, idx + 1].reshape(b, n0)
            )
        return out

    def V(self, vec):
        patches = self._reorder_in(vec)
        patches = jnp.einsum("ij,bcnj->bcni", self.V_small, patches)
        return self._from_patches(patches)

    def Vt(self, vec):
        patches = self._to_patches(vec)
        patches = jnp.einsum("ij,bcnj->bcni", self.V_small.T, patches)
        return self._reorder_out(patches)

    def U(self, vec):
        return self.U_small[0, 0] * _flat(vec)

    Ut = U

    def singulars(self):
        return jnp.tile(self.singulars_small, self.channels * self.y_dim**2)

    def add_zeros(self, vec):
        temp = _flat(vec)
        return jnp.pad(temp, ((0, 0), (0, temp.shape[1] * (self.ratio**2 - 1))))


def _conv_matrix(kernel: np.ndarray, img_dim: int) -> np.ndarray:
    """1D convolution matrix with zero boundary (svd_replacement.py:404-410)."""
    H = np.zeros((img_dim, img_dim), dtype=np.float64)
    k = kernel.shape[0]
    for i in range(img_dim):
        for j in range(i - k // 2, i + k // 2):
            if j < 0 or j >= img_dim:
                continue
            H[i, j] = kernel[j - i + k // 2]
    return H


class Deblurring(HFunction):
    """Separable blur with identical row/col kernels (svd_replacement.py:397-464)."""

    def __init__(self, kernel, channels: int, img_dim: int, zero: float = 3e-2):
        self.img_dim = img_dim
        self.channels = channels
        kernel = np.asarray(kernel, dtype=np.float64)
        H_small = _conv_matrix(kernel, img_dim)
        U, s, Vh = np.linalg.svd(H_small, full_matrices=True)
        s[s < zero] = 0
        big = np.outer(s, s).reshape(-1)
        order = np.argsort(-big)  # descending
        self._perm = jnp.asarray(order)
        self._inv_perm = jnp.asarray(np.argsort(order))
        self._singulars = jnp.asarray(big[order], dtype=jnp.float32)
        self.U_small = jnp.asarray(U, dtype=jnp.float32)
        self.V_small = jnp.asarray(Vh.T, dtype=jnp.float32)

    def _img(self, vec):
        b = vec.shape[0]
        return _flat(vec).reshape(b, self.channels, self.img_dim, self.img_dim)

    def _two_sided(self, M_left, vec_img, M_right):
        return jnp.einsum(
            "ij,bcjk,kl->bcil", M_left, vec_img, M_right
        )

    def V(self, vec):
        b = vec.shape[0]
        temp = _flat(vec)[:, self._inv_perm].reshape(
            b, self.channels, self.img_dim, self.img_dim
        )
        # NOTE: the reference scatters the permutation over the pixel axis before
        # splitting channels (vec laid out (n^2, C)); with C=1 this is identical.
        out = self._two_sided(self.V_small, temp, self.V_small.T)
        return out.reshape(b, -1)

    def Vt(self, vec):
        b = vec.shape[0]
        temp = self._two_sided(self.V_small.T, self._img(vec), self.V_small)
        temp = temp.reshape(b, self.channels, -1)[:, :, self._perm]
        return temp.swapaxes(1, 2).reshape(b, -1) if self.channels > 1 else temp.reshape(b, -1)

    def U(self, vec):
        b = vec.shape[0]
        temp = _flat(vec)[:, self._inv_perm].reshape(
            b, self.channels, self.img_dim, self.img_dim
        )
        out = self._two_sided(self.U_small, temp, self.U_small.T)
        return out.reshape(b, -1)

    def Ut(self, vec):
        b = vec.shape[0]
        temp = self._two_sided(self.U_small.T, self._img(vec), self.U_small)
        temp = temp.reshape(b, self.channels, -1)[:, :, self._perm]
        return temp.swapaxes(1, 2).reshape(b, -1) if self.channels > 1 else temp.reshape(b, -1)

    def singulars(self):
        return jnp.tile(self._singulars, self.channels)

    def add_zeros(self, vec):
        return _flat(vec)


class Deblurring2D(Deblurring):
    """Anisotropic separable blur (svd_replacement.py:467-541)."""

    def __init__(self, kernel1, kernel2, channels: int, img_dim: int, zero: float = 3e-2):
        self.img_dim = img_dim
        self.channels = channels
        H1 = _conv_matrix(np.asarray(kernel1, dtype=np.float64), img_dim)
        H2 = _conv_matrix(np.asarray(kernel2, dtype=np.float64), img_dim)
        U1, s1, V1h = np.linalg.svd(H1, full_matrices=True)
        U2, s2, V2h = np.linalg.svd(H2, full_matrices=True)
        s1[s1 < zero] = 0
        s2[s2 < zero] = 0
        big = np.outer(s1, s2).reshape(-1)
        order = np.argsort(-big)
        self._perm = jnp.asarray(order)
        self._inv_perm = jnp.asarray(np.argsort(order))
        self._singulars = jnp.asarray(big[order], dtype=jnp.float32)
        self.U1 = jnp.asarray(U1, dtype=jnp.float32)
        self.U2 = jnp.asarray(U2, dtype=jnp.float32)
        self.V1 = jnp.asarray(V1h.T, dtype=jnp.float32)
        self.V2 = jnp.asarray(V2h.T, dtype=jnp.float32)

    def V(self, vec):
        b = vec.shape[0]
        temp = _flat(vec)[:, self._inv_perm].reshape(
            b, self.channels, self.img_dim, self.img_dim
        )
        return self._two_sided(self.V1, temp, self.V2.T).reshape(b, -1)

    def Vt(self, vec):
        b = vec.shape[0]
        temp = self._two_sided(self.V1.T, self._img(vec), self.V2)
        temp = temp.reshape(b, self.channels, -1)[:, :, self._perm]
        # pixel-major interleave like the reference's final permute(0, 2, 1)
        if self.channels > 1:
            temp = temp.swapaxes(1, 2)
        return temp.reshape(b, -1)

    def U(self, vec):
        b = vec.shape[0]
        temp = _flat(vec)[:, self._inv_perm].reshape(
            b, self.channels, self.img_dim, self.img_dim
        )
        return self._two_sided(self.U1, temp, self.U2.T).reshape(b, -1)

    def Ut(self, vec):
        b = vec.shape[0]
        temp = self._two_sided(self.U1.T, self._img(vec), self.U2)
        temp = temp.reshape(b, self.channels, -1)[:, :, self._perm]
        if self.channels > 1:
            temp = temp.swapaxes(1, 2)
        return temp.reshape(b, -1)


class SRConv(HFunction):
    """Convolution-based super-resolution with reflective padding
    (svd_replacement.py:314-395)."""

    def __init__(self, kernel, channels: int, img_dim: int, stride: int = 1, zero: float = 3e-2):
        self.img_dim = img_dim
        self.channels = channels
        self.ratio = stride
        small_dim = img_dim // stride
        self.small_dim = small_dim
        kernel = np.asarray(kernel, dtype=np.float64)
        H_small = np.zeros((small_dim, img_dim), dtype=np.float64)
        for i in range(stride // 2, img_dim + stride // 2, stride):
            for j in range(i - kernel.shape[0] // 2, i + kernel.shape[0] // 2):
                j_eff = j
                if j_eff < 0:
                    j_eff = -j_eff - 1
                if j_eff >= img_dim:
                    j_eff = (img_dim - 1) - (j_eff - img_dim)
                H_small[i // stride, j_eff] += kernel[j - i + kernel.shape[0] // 2]
        U, s, Vh = np.linalg.svd(H_small, full_matrices=True)
        s[s < zero] = 0
        self.U_small = jnp.asarray(U, dtype=jnp.float32)  # (small, small)
        self.V_small = jnp.asarray(Vh.T, dtype=jnp.float32)  # (img, img)
        self._singulars = jnp.asarray(
            np.outer(s, s).reshape(-1), dtype=jnp.float32
        )
        perm = np.array(
            [img_dim * i + j for i in range(small_dim) for j in range(small_dim)]
            + [
                img_dim * i + j
                for i in range(small_dim)
                for j in range(small_dim, img_dim)
            ],
            dtype=np.int64,
        )
        self._perm = jnp.asarray(perm)

    def V(self, vec):
        b = vec.shape[0]
        temp_in = _flat(vec).reshape(b, self.img_dim**2, self.channels)
        temp = jnp.zeros_like(temp_in)
        temp = temp.at[:, self._perm, :].set(temp_in[:, : self._perm.shape[0], :])
        temp = temp.at[:, self._perm.shape[0] :, :].set(
            temp_in[:, self._perm.shape[0] :, :]
        )
        img = temp.swapaxes(1, 2).reshape(b, self.channels, self.img_dim, self.img_dim)
        out = jnp.einsum("ij,bcjk,kl->bcil", self.V_small, img, self.V_small.T)
        return out.reshape(b, -1)

    def Vt(self, vec):
        b = vec.shape[0]
        img = _flat(vec).reshape(b, self.channels, self.img_dim, self.img_dim)
        temp = jnp.einsum("ij,bcjk,kl->bcil", self.V_small.T, img, self.V_small)
        temp = temp.reshape(b, self.channels, -1)
        temp = temp.at[:, :, : self._perm.shape[0]].set(temp[:, :, self._perm])
        return temp.swapaxes(1, 2).reshape(b, -1)

    def U(self, vec):
        b = vec.shape[0]
        temp = _flat(vec).reshape(b, self.small_dim**2, self.channels)
        img = temp.swapaxes(1, 2).reshape(
            b, self.channels, self.small_dim, self.small_dim
        )
        out = jnp.einsum("ij,bcjk,kl->bcil", self.U_small, img, self.U_small.T)
        return out.reshape(b, -1)

    def Ut(self, vec):
        b = vec.shape[0]
        img = _flat(vec).reshape(b, self.channels, self.small_dim, self.small_dim)
        temp = jnp.einsum("ij,bcjk,kl->bcil", self.U_small.T, img, self.U_small)
        return temp.reshape(b, self.channels, -1).swapaxes(1, 2).reshape(b, -1)

    def singulars(self):
        # reference repeats interleaved x3 regardless of channels
        # (svd_replacement.py:384-385); we honor the actual channel count
        return jnp.repeat(self._singulars, self.channels)

    def add_zeros(self, vec):
        temp = _flat(vec)
        return jnp.pad(temp, ((0, 0), (0, temp.shape[1] * (self.ratio**2 - 1))))


class WalshHadamardCS(HFunction):
    """Walsh-Hadamard compressive sensing (svd_replacement.py:271-312).

    The FWHT butterfly is expressed as a log2(n)-step reshape/concat loop — a
    fully fused XLA program (and a Pallas candidate, SURVEY.md §7).
    """

    def __init__(self, channels: int, img_dim: int, ratio: int, perm):
        self.channels = channels
        self.img_dim = img_dim
        self.ratio = ratio
        perm = np.asarray(perm, dtype=np.int64)
        self.perm = jnp.asarray(perm)
        self.inv_perm = jnp.asarray(np.argsort(perm))
        self._singulars = jnp.ones(
            channels * img_dim**2 // ratio, dtype=jnp.float32
        )

    def fwht(self, vec):
        """Two MXU matmuls instead of the reference's 12-pass butterfly — see
        hicdiff_tpu.kernels.fwht (H_{n^2} = H_n (x) H_n)."""
        from hicdiff_tpu.kernels.fwht import fwht_matmul

        b = vec.shape[0]
        n = self.img_dim**2
        a = vec.reshape(b, self.channels, n)
        return fwht_matmul(a, self.img_dim)

    def V(self, vec):
        b = vec.shape[0]
        temp = _flat(vec).reshape(b, -1, self.channels).swapaxes(1, 2)
        temp = temp[:, :, self.inv_perm]
        return self.fwht(temp).reshape(b, -1)

    def Vt(self, vec):
        b = vec.shape[0]
        out = self.fwht(_flat(vec).reshape(b, self.channels, -1))
        return out[:, :, self.perm].swapaxes(1, 2).reshape(b, -1)

    def U(self, vec):
        return _flat(vec)

    Ut = U

    def singulars(self):
        return self._singulars

    def add_zeros(self, vec):
        temp = _flat(vec)
        pad = self.channels * self.img_dim**2 - temp.shape[1]
        return jnp.pad(temp, ((0, 0), (0, pad)))


class Colorization(HFunction):
    """RGB -> gray averaging (svd_replacement.py:228-269); kept for DDRM parity."""

    def __init__(self, img_dim: int):
        self.channels = 3
        self.img_dim = img_dim
        H = np.array([[0.3333, 0.3334, 0.3333]], dtype=np.float64)
        U, s, Vh = np.linalg.svd(H, full_matrices=True)
        self.U_small = jnp.asarray(U, dtype=jnp.float32)
        self.singulars_small = jnp.asarray(s, dtype=jnp.float32)
        self.V_small = jnp.asarray(Vh.T, dtype=jnp.float32)

    def V(self, vec):
        b = vec.shape[0]
        needles = _flat(vec).reshape(b, self.channels, -1).swapaxes(1, 2)
        needles = jnp.einsum("ij,bnj->bni", self.V_small, needles)
        return needles.swapaxes(1, 2).reshape(b, -1)

    def Vt(self, vec):
        b = vec.shape[0]
        needles = _flat(vec).reshape(b, self.channels, -1).swapaxes(1, 2)
        needles = jnp.einsum("ij,bnj->bni", self.V_small.T, needles)
        return needles.swapaxes(1, 2).reshape(b, -1)

    def U(self, vec):
        return self.U_small[0, 0] * _flat(vec)

    Ut = U

    def singulars(self):
        return jnp.tile(self.singulars_small, self.img_dim**2)

    def add_zeros(self, vec):
        temp = _flat(vec)
        out = jnp.zeros((vec.shape[0], self.channels * self.img_dim**2), temp.dtype)
        return out.at[:, : self.img_dim**2].set(temp)


class GeneralH(HFunction):
    """Dense-SVD operator for arbitrary H (svd_replacement.py:72-108)."""

    def __init__(self, H: np.ndarray, zero: float = 1e-3):
        H = np.asarray(H, dtype=np.float64)
        U, s, Vh = np.linalg.svd(H, full_matrices=True)
        s[s < zero] = 0
        self._U = jnp.asarray(U, dtype=jnp.float32)
        self._V = jnp.asarray(Vh.T, dtype=jnp.float32)
        self._singulars = jnp.asarray(s, dtype=jnp.float32)

    def V(self, vec):
        return _flat(vec) @ self._V.T

    def Vt(self, vec):
        return _flat(vec) @ self._V

    def U(self, vec):
        return _flat(vec) @ self._U.T

    def Ut(self, vec):
        return _flat(vec) @ self._U

    def singulars(self):
        return self._singulars

    def add_zeros(self, vec):
        temp = _flat(vec)
        pad = self._V.shape[0] - temp.shape[1]
        return jnp.pad(temp, ((0, 0), (0, pad)))


def _bicubic_kernel(x: float, a: float = -0.5) -> float:
    if abs(x) <= 1:
        return (a + 2) * abs(x) ** 3 - (a + 3) * abs(x) ** 2 + 1
    elif 1 < abs(x) < 2:
        return a * abs(x) ** 3 - 5 * a * abs(x) ** 2 + 8 * a * abs(x) - 4 * a
    return 0.0


def make_operator(
    deg: str = "deno",
    image_channel: int = 1,
    image_size: int = 64,
    *,
    rng: np.random.Generator | None = None,
) -> HFunction:
    """Factory mapping a degradation string to an operator (H_func.py:4-68).

    Randomized degradations (cs*, inp_mask) draw from `rng` (default seeded 0)
    instead of torch.randperm, making prep caches reproducible.
    """
    rng = rng or np.random.default_rng(0)
    if deg[:2] == "cs":
        compress_by = int(deg[2:])
        perm = rng.permutation(image_size**2)
        return WalshHadamardCS(image_channel, image_size, compress_by, perm)
    elif deg[:3] == "inp":
        missing = rng.permutation(image_size**2)[: image_size**2 // 2]
        return Inpainting(image_channel, image_size, np.sort(missing))
    elif deg == "deno":
        return Denoising(image_channel, image_size)
    elif deg[:10] == "sr_bicubic":
        factor = int(deg[10:])
        k = np.zeros(factor * 4)
        for i in range(factor * 4):
            x = (1 / factor) * (i - np.floor(factor * 4 / 2) + 0.5)
            k[i] = _bicubic_kernel(x)
        k = k / k.sum()
        return SRConv(k, image_channel, image_size, stride=factor)
    elif deg == "deblur_uni":
        return Deblurring(np.full(9, 1.0 / 9.0), image_channel, image_size)
    elif deg == "deblur_gauss":
        sigma = 10.0
        kernel = np.exp(-0.5 * (np.array([-2, -1, 0, 1, 2]) / sigma) ** 2)
        return Deblurring(kernel / kernel.sum(), image_channel, image_size)
    elif deg == "deblur_aniso":
        x = np.arange(-4, 5, dtype=np.float64)
        k2 = np.exp(-0.5 * (x / 20.0) ** 2)
        k1 = np.exp(-0.5 * (x / 1.0) ** 2)
        return Deblurring2D(
            k1 / k1.sum(), k2 / k2.sum(), image_channel, image_size
        )
    elif deg[:2] == "sr":
        blur_by = int(deg[2:])
        return SuperResolution(image_channel, image_size, blur_by)
    elif deg == "color":
        return Colorization(image_size)
    raise ValueError(f"degradation type not supported: {deg}")
