"""ADA augmentation pipeline (ref: src/training/augment.py — AugmentPipe).

Batched, jit-compatible reimplementation of the ADA pipeline actually used
by 3DGP (configs/training/base.yaml probs): pixel blitting (xflip, rot90,
integer translation) + general geometric (iso/aniso scale, rotation,
fractional translation) composed as per-sample inverse affine matrices and
executed with wavelet-filtered 2x over/down-sampling, followed by color
matrix transforms (brightness, contrast, lumaflip, hue, saturation) applied
to the color channels only — non-color channels (the depth map) ride along
unchanged (ref :371-376). Noise/cutout are included for completeness
(strength 0 in all shipped configs).

jit adaptations:
  - `p` is a traced scalar (the ADA controller updates it host-side)
  - the reference's data-dependent reflect-padding margins (ref :275-290)
    become a fixed conservative margin (static shapes); identical output for
    all in-range transforms since margins were clipped to the same bound
  - everything runs NHWC.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tdgp.config import AugmentCfg
from tdgp.ops.grid_sample import grid_sample_nhwc
from tdgp.ops.upfirdn2d import downsample2d, setup_filter, upsample2d

# sym6 wavelet lowpass (pywt); the reference's Hz_geom (ref augment.py:21-46)
SYM6 = np.asarray([
    0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
    -0.048311742585633, 0.4910559419267466, 0.787641141030194,
    0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
    0.04472490177066578, 0.0017677118642428036, -0.007800708325034148,
], dtype=np.float32)

# sym2 lowpass — basis of the 4-band image-filter bank (ref augment.py:36,
# 175-184)
SYM2 = np.asarray([-0.12940952255092145, 0.22414386804185735,
                   0.836516303737469, 0.48296291314469025], dtype=np.float32)


def _build_fbank() -> np.ndarray:
    """4-band wavelet filter bank Hz_fbank (ref augment.py:175-184)."""
    import scipy.signal
    hz_lo = SYM2.astype(np.float64)
    hz_hi = hz_lo * ((-1) ** np.arange(hz_lo.size))
    hz_lo2 = np.convolve(hz_lo, hz_lo[::-1]) / 2
    hz_hi2 = np.convolve(hz_hi, hz_hi[::-1]) / 2
    fbank = np.eye(4, 1)
    for i in range(1, fbank.shape[0]):
        fbank = np.dstack([fbank, np.zeros_like(fbank)]).reshape(fbank.shape[0], -1)[:, :-1]
        fbank = scipy.signal.convolve(fbank, [hz_lo2])
        fbank[i, (fbank.shape[1] - hz_hi2.size) // 2:
              (fbank.shape[1] + hz_hi2.size) // 2] += hz_hi2
    return fbank.astype(np.float32)


def _translate2d(tx, ty):
    b = tx.shape[0]
    m = jnp.tile(jnp.eye(3), (b, 1, 1))
    return m.at[:, 0, 2].set(tx).at[:, 1, 2].set(ty)


def _scale2d(sx, sy):
    b = sx.shape[0]
    m = jnp.tile(jnp.eye(3), (b, 1, 1))
    return m.at[:, 0, 0].set(sx).at[:, 1, 1].set(sy)


def _rotate2d(theta):
    b = theta.shape[0]
    c, s = jnp.cos(theta), jnp.sin(theta)
    m = jnp.tile(jnp.eye(3), (b, 1, 1))
    return (m.at[:, 0, 0].set(c).at[:, 0, 1].set(-s)
             .at[:, 1, 0].set(s).at[:, 1, 1].set(c))


def _translate3d(t):
    b = t.shape[0]
    m = jnp.tile(jnp.eye(4), (b, 1, 1))
    return m.at[:, 0, 3].set(t).at[:, 1, 3].set(t).at[:, 2, 3].set(t)


def _scale3d(s):
    b = s.shape[0]
    m = jnp.tile(jnp.eye(4), (b, 1, 1))
    for i in range(3):
        m = m.at[:, i, i].set(s)
    return m


def _rotate3d_about(v: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation about unit axis v (4x4 homogeneous), batched theta."""
    b = theta.shape[0]
    vx, vy, vz = float(v[0]), float(v[1]), float(v[2])
    s, c = jnp.sin(theta), jnp.cos(theta)
    cc = 1 - c
    rows = [
        [vx * vx * cc + c, vx * vy * cc - vz * s, vx * vz * cc + vy * s],
        [vy * vx * cc + vz * s, vy * vy * cc + c, vy * vz * cc - vx * s],
        [vz * vx * cc - vy * s, vz * vy * cc + vx * s, vz * vz * cc + c],
    ]
    m = jnp.tile(jnp.eye(4), (b, 1, 1))
    for i in range(3):
        for j in range(3):
            m = m.at[:, i, j].set(rows[i][j])
    return m


class AugmentPipe:
    """Stateless callable: (images [N,H,W,C], p, rng) -> images."""

    def __init__(self, cfg: AugmentCfg, num_color_channels: int = 3,
                 xint_max: float = 0.125, scale_std: float = 0.2,
                 rotate_max: float = 1.0, aniso_std: float = 0.2,
                 xfrac_std: float = 0.125, brightness_std: float = 0.2,
                 contrast_std: float = 0.5, hue_max: float = 1.0,
                 saturation_std: float = 1.0, noise_std: float = 0.1,
                 cutout_size: float = 0.5,
                 imgfilter_bands=(1.0, 1.0, 1.0, 1.0),
                 imgfilter_std: float = 1.0):
        self.cfg = cfg
        self.num_color_channels = num_color_channels
        self.xint_max = xint_max
        self.scale_std = scale_std
        self.rotate_max = rotate_max
        self.aniso_std = aniso_std
        self.xfrac_std = xfrac_std
        self.brightness_std = brightness_std
        self.contrast_std = contrast_std
        self.hue_max = hue_max
        self.saturation_std = saturation_std
        self.noise_std = noise_std
        self.cutout_size = cutout_size
        self.imgfilter_bands = tuple(imgfilter_bands)
        self.imgfilter_std = imgfilter_std
        self.hz_geom = setup_filter(SYM6)
        self.hz_fbank = jnp.asarray(_build_fbank()) if cfg.imgfilter > 0 else None

    def __call__(self, images: jnp.ndarray, p: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        cfg = self.cfg
        n, h, w, c = images.shape
        keys = iter(jax.random.split(rng, 40))

        def gate(key, prob_weight, value, identity):
            """Apply `value` with probability weight*p, else identity."""
            mask = jax.random.uniform(key, (n,)) < prob_weight * p
            return jnp.where(mask.reshape((n,) + (1,) * (value.ndim - 1)), value, identity)

        # ---------------- geometric: compose inverse 2D affine (ref :196-270)
        g_inv = jnp.tile(jnp.eye(3), (n, 1, 1))
        if cfg.xflip > 0:
            i = jnp.floor(jax.random.uniform(next(keys), (n,)) * 2)
            i = gate(next(keys), cfg.xflip, i, jnp.zeros_like(i))
            g_inv = g_inv @ _scale2d(1.0 / (1 - 2 * i), jnp.ones(n))
        if cfg.rotate90 > 0:
            i = jnp.floor(jax.random.uniform(next(keys), (n,)) * 4)
            i = gate(next(keys), cfg.rotate90, i, jnp.zeros_like(i))
            g_inv = g_inv @ _rotate2d(np.pi / 2 * i)  # inverse of rotate(-pi/2*i)
        if cfg.xint > 0:
            t = (jax.random.uniform(next(keys), (n, 2)) * 2 - 1) * self.xint_max
            t = gate(next(keys), cfg.xint, t, jnp.zeros_like(t))
            g_inv = g_inv @ _translate2d(-jnp.round(t[:, 0] * w), -jnp.round(t[:, 1] * h))
        if cfg.scale > 0:
            s = jnp.exp2(jax.random.normal(next(keys), (n,)) * self.scale_std)
            s = gate(next(keys), cfg.scale, s, jnp.ones_like(s))
            g_inv = g_inv @ _scale2d(1.0 / s, 1.0 / s)
        p_rot = 1 - jnp.sqrt(jnp.clip(1 - cfg.rotate * p, 0, 1))
        if cfg.rotate > 0:
            theta = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * np.pi * self.rotate_max
            mask = jax.random.uniform(next(keys), (n,)) < p_rot
            theta = jnp.where(mask, theta, 0.0)
            g_inv = g_inv @ _rotate2d(theta)  # inverse of rotate(-theta)
        if cfg.aniso > 0:
            s = jnp.exp2(jax.random.normal(next(keys), (n,)) * self.aniso_std)
            s = gate(next(keys), cfg.aniso, s, jnp.ones_like(s))
            g_inv = g_inv @ _scale2d(1.0 / s, s)
        if cfg.rotate > 0:
            theta = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * np.pi * self.rotate_max
            mask = jax.random.uniform(next(keys), (n,)) < p_rot
            theta = jnp.where(mask, theta, 0.0)
            g_inv = g_inv @ _rotate2d(theta)
        if cfg.xfrac > 0:
            t = jax.random.normal(next(keys), (n, 2)) * self.xfrac_std
            t = gate(next(keys), cfg.xfrac, t, jnp.zeros_like(t))
            g_inv = g_inv @ _translate2d(-t[:, 0] * w, -t[:, 1] * h)

        images = self._execute_geometric(images, g_inv)

        # ---------------- color: compose 4x4 matrix (ref :316-354)
        c_mat = jnp.tile(jnp.eye(4), (n, 1, 1))
        if cfg.brightness > 0:
            b = jax.random.normal(next(keys), (n,)) * self.brightness_std
            b = gate(next(keys), cfg.brightness, b, jnp.zeros_like(b))
            c_mat = _translate3d(b) @ c_mat
        if cfg.contrast > 0:
            cc = jnp.exp2(jax.random.normal(next(keys), (n,)) * self.contrast_std)
            cc = gate(next(keys), cfg.contrast, cc, jnp.ones_like(cc))
            c_mat = _scale3d(cc) @ c_mat
        v = np.asarray([1, 1, 1, 0]) / np.sqrt(3)
        vvt = jnp.asarray(np.outer(v, v), dtype=jnp.float32)
        if cfg.lumaflip > 0:
            i = jnp.floor(jax.random.uniform(next(keys), (n,)) * 2)
            i = gate(next(keys), cfg.lumaflip, i, jnp.zeros_like(i))
            c_mat = (jnp.eye(4) - 2 * vvt * i[:, None, None]) @ c_mat
        if cfg.hue > 0 and self.num_color_channels > 1:
            theta = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * np.pi * self.hue_max
            theta = gate(next(keys), cfg.hue, theta, jnp.zeros_like(theta))
            c_mat = _rotate3d_about(v[:3] / np.linalg.norm(v[:3]), theta) @ c_mat
        if cfg.saturation > 0 and self.num_color_channels > 1:
            s = jnp.exp2(jax.random.normal(next(keys), (n,)) * self.saturation_std)
            s = gate(next(keys), cfg.saturation, s, jnp.ones_like(s))
            c_mat = (vvt + (jnp.eye(4) - vvt) * s[:, None, None]) @ c_mat

        images = self._execute_color(images, c_mat)

        # ---------------- image-space filtering (ref :385-413)
        if cfg.imgfilter > 0:
            num_bands = self.hz_fbank.shape[0]
            assert len(self.imgfilter_bands) == num_bands
            expected_power = jnp.asarray(np.array([10, 1, 1, 1]) / 13,
                                         dtype=jnp.float32)
            gvec = jnp.ones((n, num_bands))
            for i, band_strength in enumerate(self.imgfilter_bands):
                t_i = jnp.exp2(jax.random.normal(next(keys), (n,)) * self.imgfilter_std)
                mask = jax.random.uniform(next(keys), (n,)) < (
                    cfg.imgfilter * p * band_strength)
                t_i = jnp.where(mask, t_i, 1.0)
                t = jnp.ones((n, num_bands)).at[:, i].set(t_i)
                t = t / jnp.sqrt(jnp.sum(expected_power * t ** 2, axis=-1,
                                         keepdims=True))
                gvec = gvec * t
            hz_prime = gvec @ self.hz_fbank                        # [n, taps]
            images = self._execute_imgfilter(images, hz_prime)

        # ---------------- image-space corruptions (ref :415-442)
        if cfg.noise > 0:
            sigma = jnp.abs(jax.random.normal(next(keys), (n,))) * self.noise_std
            sigma = gate(next(keys), cfg.noise, sigma, jnp.zeros_like(sigma))
            images = images + (jax.random.normal(next(keys), images.shape)
                               * sigma[:, None, None, None])
        if cfg.cutout > 0:
            size = jnp.full((n,), self.cutout_size)
            size = gate(next(keys), cfg.cutout, size, jnp.zeros_like(size))
            center = jax.random.uniform(next(keys), (n, 2))
            cx = (jnp.arange(w) + 0.5) / w                          # [W]
            cy = (jnp.arange(h) + 0.5) / h                          # [H]
            mask_x = jnp.abs(cx[None, :] - center[:, 0:1]) >= size[:, None] / 2
            mask_y = jnp.abs(cy[None, :] - center[:, 1:2]) >= size[:, None] / 2
            mask = jnp.logical_or(mask_x[:, None, :], mask_y[:, :, None])
            images = images * mask[..., None].astype(images.dtype)
        return images

    def _execute_imgfilter(self, images: jnp.ndarray,
                           hz_prime: jnp.ndarray) -> jnp.ndarray:
        """Separable per-sample frequency-band amplification (ref :400-413).
        Batch rides the channel axis so one depthwise conv applies a distinct
        filter per sample."""
        n, h, w, c = images.shape
        taps = hz_prime.shape[1]
        pad = taps // 2
        x = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    mode='reflect')
        x = x.transpose(1, 2, 0, 3).reshape(1, h + 2 * pad, w + 2 * pad, n * c)
        rhs = jnp.repeat(hz_prime, c, axis=0).T                     # [taps, n*c]
        dn = jax.lax.conv_dimension_numbers(x.shape, (1, taps, 1, n * c),
                                            ('NHWC', 'HWIO', 'NHWC'))
        # torch conv2d = correlation with no filter flip; weights here are
        # built symmetric-normalized from the fbank, orientation matters not
        x = jax.lax.conv_general_dilated(
            x, rhs.reshape(1, taps, 1, n * c), window_strides=(1, 1),
            padding='VALID', dimension_numbers=dn, feature_group_count=n * c)
        x = jax.lax.conv_general_dilated(
            x, rhs.reshape(taps, 1, 1, n * c), window_strides=(1, 1),
            padding='VALID', dimension_numbers=dn, feature_group_count=n * c)
        return x.reshape(h, w, n, c).transpose(2, 0, 1, 3)

    def _execute_geometric(self, images: jnp.ndarray, g_inv: jnp.ndarray) -> jnp.ndarray:
        """Pad-reflect, 2x wavelet upsample, affine grid-sample, downsample
        (ref :272-312). Fixed conservative margin for static shapes."""
        n, h, w, c = images.shape
        hz_pad = self.hz_geom.shape[0] // 4
        # conservative static margin: covers any rotation/scale the pipeline
        # produces (the reference clips margins to width-1 anyway)
        mx = min(w - 1, w // 2 + hz_pad * 2)
        my = min(h - 1, h // 2 + hz_pad * 2)
        images = jnp.pad(images, ((0, 0), (my, my), (mx, mx), (0, 0)), mode='reflect')
        # symmetric margins -> no origin adjustment needed (ref :292 with mx0==mx1)

        images = upsample2d(images, self.hz_geom, up=2)
        two = jnp.full((n,), 2.0)
        half = jnp.full((n,), 0.5)
        g = _scale2d(two, two) @ g_inv @ _scale2d(half, half)
        g = _translate2d(-half, -half) @ g @ _translate2d(half, half)

        hp, wp = images.shape[1], images.shape[2]       # padded, upsampled size
        h_out, w_out = (h + hz_pad * 2) * 2, (w + hz_pad * 2) * 2
        sx = jnp.full((n,), 2.0 / wp)
        sy = jnp.full((n,), 2.0 / hp)
        g = _scale2d(sx, sy) @ g @ _scale2d(jnp.full((n,), w_out / 2.0),
                                            jnp.full((n,), h_out / 2.0))

        # output NDC grid, align_corners=False convention
        ys = (jnp.arange(h_out) + 0.5) * 2.0 / h_out - 1.0
        xs = (jnp.arange(w_out) + 0.5) * 2.0 / w_out - 1.0
        gx, gy = jnp.meshgrid(xs, ys)                    # [h_out, w_out]
        ones = jnp.ones_like(gx)
        pts = jnp.stack([gx, gy, ones], axis=-1).reshape(-1, 3)  # [P, 3]
        coords = jnp.einsum('nij,pj->npi', g[:, :2, :], pts)     # [n, P, 2]
        grid = coords.reshape(n, h_out, w_out, 2)
        images = grid_sample_nhwc(images, grid, align_corners=False)

        # the output canvas was (h + 2*hz_pad)*2; the negative padding here
        # crops the filter halo back to exactly (h, w) (ref :311-312)
        images = downsample2d(images, self.hz_geom, down=2, padding=-hz_pad * 2,
                              flip_filter=True)
        assert images.shape[1] == h and images.shape[2] == w, images.shape
        return images

    def _execute_color(self, images: jnp.ndarray, c_mat: jnp.ndarray) -> jnp.ndarray:
        """Apply 4x4 color matrix to color channels only (ref :356-382)."""
        n, h, w, c = images.shape
        ncc = self.num_color_channels
        color = images[..., :ncc]
        rest = images[..., ncc:]
        if ncc == 3:
            out = jnp.einsum('nij,nhwj->nhwi', c_mat[:, :3, :3], color) + \
                c_mat[:, :3, 3][:, None, None, :]
        elif ncc == 1:
            m = jnp.mean(c_mat[:, :3, :], axis=1, keepdims=True)  # [n, 1, 4]
            out = color * jnp.sum(m[:, :, :3], axis=2)[:, None, None, :] + \
                m[:, :, 3][:, None, None, :]
        else:
            raise ValueError('color channels must be 1 or 3')
        return jnp.concatenate([out, rest], axis=-1)
