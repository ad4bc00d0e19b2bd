"""Two-pass (coarse + importance) volume renderer.

Counterpart of ref src/training/tri_plane_renderer.py:117-405
(ImportanceRenderer + ClassicalRayMarcher + MipRayMarcher2), redesigned as
pure functions with static shapes:

  - stratified + importance sampling run entirely on device inside jit
    (searchsorted/cumsum/sort are all XLA-native; the reference wrapped the
    PDF sampling in `torch.no_grad`, here `stop_gradient` does the same)
  - the model is injected as a callable `run_model(coords) -> (rgb, sigma)`,
    so the same renderer drives the jnp tri-plane path and the fused Pallas
    ray kernel
  - rays are embarrassingly parallel: chunking (the reference's
    `run_batchwise`, training_utils.py:171-203) is unnecessary under XLA on
    TPU for training sizes, and eval-time tiling is done by the caller by
    reshaping the ray axis.

Shape conventions: colors [B, R, S, C]; densities/depths [B, R, S].
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RenderOptions:
    """Static rendering configuration (hashable -> usable as a jit closure)."""
    num_proposal_steps: int = 32
    num_fine_steps: int = 32
    ray_start: float = 0.75
    ray_end: float = 1.25
    box_size: float = 1.0           # cube side (= cube_scale * 2)
    ray_marcher_type: str = 'classical'  # 'classical' | 'mip'
    clamp_mode: str = 'softplus'    # 'softplus' | 'relu'
    sp_beta: float = 1.0
    use_inf_depth: bool = True
    last_back: bool = False
    white_back: bool = False
    white_back_end_idx: int = 0
    density_bias: float = 0.0
    cut_quantile: float = 0.0
    fill_mode: Optional[str] = None  # None | 'debug' | 'weight'
    # 'jnp' | 'fused' (Pallas one-pass VMEM integration, ops/pallas_kernels.py)
    # — callers resolve 'auto' to one of these before building RenderOptions
    march_impl: str = 'jnp'


# ----------------------------------------------------------- ray marchers

def _apply_cut_quantile(densities: jnp.ndarray, q: float) -> jnp.ndarray:
    """Zero densities below the q-quantile (eval-time 3D cleanup, ref :366-368)."""
    if q <= 0.0:
        return densities
    thresh = jnp.quantile(densities, q)
    return jnp.where(densities < thresh, 0.0, densities)


def classical_ray_march(colors: jnp.ndarray, densities: jnp.ndarray, depths: jnp.ndarray,
                        opts: RenderOptions):
    """ref tri_plane_renderer.py:352-405.

    colors [B,R,S,C], densities [B,R,S], depths [B,R,S]
    -> (rgb [B,R,C], depth [B,R], weights [B,R,S], final_transmittance [B,R])
    """
    deltas = depths[..., 1:] - depths[..., :-1]  # [B,R,S-1]
    last_delta = 1e10 if opts.use_inf_depth else 1e-3
    deltas = jnp.concatenate([deltas, jnp.full_like(deltas[..., :1], last_delta)], axis=-1)

    if opts.clamp_mode == 'softplus':
        densities = jax.nn.softplus(opts.sp_beta * densities) / opts.sp_beta
    elif opts.clamp_mode == 'relu':
        densities = jax.nn.relu(densities)
    else:
        raise NotImplementedError(f"Unknown clamp mode: {opts.clamp_mode}")

    densities = _apply_cut_quantile(densities, opts.cut_quantile)

    alphas = 1.0 - jnp.exp(-deltas * densities)  # [B,R,S]
    trans = jnp.cumprod(1.0 - alphas + 1e-10, axis=-1)  # [B,R,S]
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans], axis=-1)  # [B,R,S+1]
    final_transmittance = trans[..., -1]
    weights = alphas * trans[..., :-1]  # [B,R,S]
    weights_agg = jnp.sum(weights, axis=-1, keepdims=True)  # [B,R,1]

    if opts.last_back:
        weights = weights.at[..., -1].add((1.0 - weights_agg)[..., 0])

    rgb = jnp.sum(weights[..., None] * colors, axis=-2)  # [B,R,C]
    depth = jnp.sum(weights * depths, axis=-1)  # [B,R]

    if opts.white_back_end_idx > 0:
        head = rgb[..., :opts.white_back_end_idx] + (1.0 - weights_agg)
        rgb = jnp.concatenate([head, rgb[..., opts.white_back_end_idx:]], axis=-1)

    if opts.fill_mode == 'debug':
        red = jnp.zeros_like(rgb).at[..., 0].set(1.0)
        rgb = jnp.where(weights_agg < 0.9, red, rgb)
    elif opts.fill_mode == 'weight':
        rgb = jnp.broadcast_to(weights_agg, rgb.shape)

    return rgb, depth, weights, final_transmittance


def mip_ray_march(colors: jnp.ndarray, densities: jnp.ndarray, depths: jnp.ndarray,
                  opts: RenderOptions):
    """ref tri_plane_renderer.py:299-348 (MipRayMarcher2). Mid-point quadrature
    + sigmoid output rescale to (-1, 1)."""
    deltas = depths[..., 1:] - depths[..., :-1]
    colors_mid = 0.5 * (colors[..., :-1, :] + colors[..., 1:, :])
    densities_mid = 0.5 * (densities[..., :-1] + densities[..., 1:])
    depths_mid = 0.5 * (depths[..., :-1] + depths[..., 1:])

    if opts.use_inf_depth:
        deltas = jnp.concatenate([deltas, jnp.full_like(deltas[..., :1], 1e10)], axis=-1)
        colors_mid = jnp.concatenate([colors_mid, colors[..., -1:, :]], axis=-2)
        densities_mid = jnp.concatenate([densities_mid, densities[..., -1:]], axis=-1)
        depths_mid = jnp.concatenate([depths_mid, depths[..., -1:]], axis=-1)

    assert opts.clamp_mode == 'softplus', "MipRayMarcher supports clamp_mode='softplus' only"
    densities_mid = jax.nn.softplus(densities_mid + opts.density_bias)
    densities_mid = _apply_cut_quantile(densities_mid, opts.cut_quantile)

    alpha = 1.0 - jnp.exp(-densities_mid * deltas)
    alpha_shifted = jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1)
    trans = jnp.cumprod(alpha_shifted, axis=-1)
    final_transmittance = trans[..., -1]
    weights = alpha * trans[..., :-1]
    weight_total = jnp.sum(weights, axis=-1, keepdims=True)

    rgb = jnp.sum(weights[..., None] * colors_mid, axis=-2)
    depth = jnp.sum(weights * depths_mid, axis=-1)

    if opts.white_back:
        rgb = rgb + (1.0 - weight_total)
    rgb = rgb * 2.0 - 1.0  # sigmoid output scale (ref :346)
    return rgb, depth, weights, final_transmittance


def _march(colors, densities, depths, opts: RenderOptions):
    if opts.ray_marcher_type == 'classical':
        return classical_ray_march(colors, densities, depths, opts)
    if opts.ray_marcher_type == 'mip':
        return mip_ray_march(colors, densities, depths, opts)
    raise NotImplementedError(opts.ray_marcher_type)


def _march_reduced(colors, densities, depths, opts: RenderOptions):
    """Final-pass march returning (rgb, depth, weights_SUM, ftrans).

    The fused Pallas integration kernel (one VMEM pass, no [B,R,S] HBM
    intermediates, analytic 1st-order VJP) applies here: the per-sample
    weights of the final march are only ever consumed as their ray-sum.
    Eval-only features (quantile cut, fill modes, white_back head) and the
    mip marcher stay on the jnp path.
    """
    if (opts.march_impl == 'fused' and opts.ray_marcher_type == 'classical'
            and opts.cut_quantile == 0.0 and opts.fill_mode is None
            and opts.white_back_end_idx == 0):
        from tdgp.ops.pallas_kernels import ray_march_fused
        return ray_march_fused(colors, densities, depths, opts.clamp_mode,
                               opts.sp_beta, opts.use_inf_depth, opts.last_back)
    rgb, depth, weights, ftrans = _march(colors, densities, depths, opts)
    return rgb, depth, jnp.sum(weights, axis=-1), ftrans


# ------------------------------------------------------------ sampling

def sample_stratified(key, batch: int, num_rays: int, num_steps: int,
                      ray_marcher_type: str = 'classical',
                      ray_start: float = 0.0, ray_end: float = 1.0,
                      jitter: bool = True) -> jnp.ndarray:
    """Jittered uniform samples in s-space (ref tri_plane_renderer.py:208-235).
    Returns [B, R, S]. jitter=False gives deterministic mid-bin samples
    (used at eval for reproducible inference)."""
    base = jnp.linspace(ray_start, ray_end, num_steps)
    base = jnp.broadcast_to(base, (batch, num_rays, num_steps))
    if jitter:
        noise = jax.random.uniform(key, (batch, num_rays, num_steps))
    else:
        noise = jnp.full((batch, num_rays, num_steps), 0.5)
    if ray_marcher_type == 'classical':
        mids = 0.5 * (base[..., 1:] + base[..., :-1])
        upper = jnp.concatenate([mids, base[..., -1:]], axis=-1)
        lower = jnp.concatenate([base[..., :1], mids], axis=-1)
        return lower + (upper - lower) * noise
    delta = (ray_end - ray_start) / (num_steps - 1)
    return base + noise * delta


def sample_pdf(key, bins: jnp.ndarray, weights: jnp.ndarray, n_importance: int,
               det: bool = False, eps: float = 1e-5) -> jnp.ndarray:
    """Inverse-CDF sampling (ref tri_plane_renderer.py:257-295).

    bins: [N, W] sorted bin edges; weights: [N, W-1]. Returns [N, n_importance],
    SORTED along the sample axis.

    TPU redesign vs the reference:
      - u is stratified ((i + U[0,1))/I) instead of iid — lower-variance
        importance estimates AND monotone, so outputs come out sorted and the
        downstream coarse/fine merge needs no sort
      - searchsorted + 4x gather are replaced by comparison-count indices and
        masked min/max interpolation-point extraction — pure VPU reductions;
        gather/scatter and per-row scans are measured hotspots on TPU.
    """
    n_rays, n_bins = bins.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # [N, W]

    if det:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_importance), (n_rays, n_importance))
    else:
        base = jnp.arange(n_importance, dtype=jnp.float32) / n_importance
        u = base[None, :] + jax.random.uniform(key, (n_rays, n_importance)) / n_importance

    le = cdf[:, :, None] <= u[:, None, :]                    # [N, W, I]
    inds = jnp.sum(le.astype(jnp.int32), axis=1)             # searchsorted right
    # interpolation endpoints without gathers: cdf/bins are sorted, so
    # value[below] = max over masked prefix, value[above] = min over suffix
    gt = jnp.logical_not(le)
    big = jnp.float32(3.4e38)
    cdf_b = cdf[:, :, None]
    bins_b = bins[:, :, None]
    cdf_lo = jnp.max(jnp.where(le, cdf_b, -big), axis=1)
    cdf_hi = jnp.min(jnp.where(gt, cdf_b, big), axis=1)
    bins_lo = jnp.max(jnp.where(le, bins_b, -big), axis=1)
    bins_hi = jnp.min(jnp.where(gt, bins_b, big), axis=1)
    # clip semantics of the reference (below>=0, above<=W-1)
    cdf_lo = jnp.where(inds == 0, cdf[:, :1], cdf_lo)
    bins_lo = jnp.where(inds == 0, bins[:, :1], bins_lo)
    cdf_hi = jnp.where(inds >= n_bins, cdf[:, -1:], cdf_hi)
    bins_hi = jnp.where(inds >= n_bins, bins[:, -1:], bins_hi)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_lo + (u - cdf_lo) / denom * (bins_hi - bins_lo)


def sample_importance(key, z_vals: jnp.ndarray, weights: jnp.ndarray, n_importance: int,
                      ray_marcher_type: str = 'classical', det: bool = False) -> jnp.ndarray:
    """ref tri_plane_renderer.py:237-255. z_vals [B,R,S]; weights [B,R,Sw]."""
    batch, num_rays, s = z_vals.shape
    z = z_vals.reshape(batch * num_rays, s)
    w = weights.reshape(batch * num_rays, -1)
    w = jax.lax.stop_gradient(w)

    if ray_marcher_type == 'mip':
        # smooth: maxpool(k=2, s=1, pad=1) then avgpool(k=2, s=1) (ref :246-250)
        wp = jnp.pad(w, ((0, 0), (1, 1)), constant_values=-jnp.inf)
        wmax = jnp.maximum(wp[:, :-1], wp[:, 1:])        # [N, Sw+1]
        w = 0.5 * (wmax[:, :-1] + wmax[:, 1:]) + 0.01    # [N, Sw]
    else:
        w = w + 1e-5

    z_mid = 0.5 * (z[:, :-1] + z[:, 1:])  # [N, S-1]
    samples = sample_pdf(key, z_mid, w[:, 1:-1], n_importance, det=det)
    samples = jax.lax.stop_gradient(samples)
    return samples.reshape(batch, num_rays, n_importance)


def unify_samples(depths1, colors1, densities1, depths2, colors2, densities2):
    """Merge + depth-sort coarse & fine samples (ref tri_plane_renderer.py:196-206).
    General (unsorted-input) path; the renderer hot path uses
    unify_samples_sorted."""
    all_depths = jnp.concatenate([depths1, depths2], axis=-1)        # [B,R,S1+S2]
    all_colors = jnp.concatenate([colors1, colors2], axis=-2)        # [B,R,S1+S2,C]
    all_densities = jnp.concatenate([densities1, densities2], axis=-1)

    idx = jnp.argsort(all_depths, axis=-1)
    all_depths = jnp.take_along_axis(all_depths, idx, axis=-1)
    all_colors = jnp.take_along_axis(all_colors, idx[..., None], axis=-2)
    all_densities = jnp.take_along_axis(all_densities, idx, axis=-1)
    return all_depths, all_colors, all_densities


def unify_samples_sorted(depths1, colors1, densities1, depths2, colors2, densities2):
    """Merge two per-ray-SORTED sample sets without sorting.

    Replaces argsort + 3x take_along_axis (measured 167 ms/step on TPU, with
    a scatter-add backward) by comparison-count merge positions + one-hot
    matmuls (MXU forward, MXU-transpose backward). Stratified coarse samples
    and stratified inverse-CDF fine samples are both sorted by construction.
    """
    s1, s2 = depths1.shape[-1], depths2.shape[-1]
    s = s1 + s2
    # merged position: strict/non-strict asymmetry breaks ties uniquely
    pos1 = jnp.arange(s1) + jnp.sum(
        (depths2[..., None, :] < depths1[..., :, None]).astype(jnp.int32), axis=-1)
    pos2 = jnp.arange(s2) + jnp.sum(
        (depths1[..., None, :] <= depths2[..., :, None]).astype(jnp.int32), axis=-1)
    oh1 = jax.nn.one_hot(pos1, s, dtype=depths1.dtype)  # [B,R,S1,S]
    oh2 = jax.nn.one_hot(pos2, s, dtype=depths2.dtype)  # [B,R,S2,S]

    def scatter(v1, v2):
        return (jnp.einsum('bri,brij->brj', v1, oh1)
                + jnp.einsum('bri,brij->brj', v2, oh2))

    all_depths = scatter(depths1, depths2)
    all_densities = scatter(densities1, densities2)
    all_colors = (jnp.einsum('bric,brij->brjc', colors1, oh1)
                  + jnp.einsum('bric,brij->brjc', colors2, oh2))
    return all_depths, all_colors, all_densities


# ------------------------------------------------------------ main entry

RunModelFn = Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]


def importance_render(run_model: RunModelFn, ray_origins: jnp.ndarray,
                      ray_directions: jnp.ndarray, key, opts: RenderOptions,
                      density_noise: jnp.ndarray | float = 0.0,
                      jitter: bool = True, token_aware: bool = False):
    """Coarse + importance two-pass rendering (ref tri_plane_renderer.py:126-170).

    run_model(coords [B, P, 3]) -> (rgb [B, P, C], sigma [B, P]).
    ray_origins/directions: [B, R, 3].
    Returns (rgb [B,R,C], depth [B,R], weights_total [B,R], final_transmittance [B,R]).

    token_aware: run_model instead has the signature
    (coords, token|None) -> (rgb, sigma, token) and the coarse call's token
    is threaded into the fine call — the channel the merged coarse+fine
    backward splat rides (ops/splat.py triplane_sample_pair_*).
    """
    batch, num_rays, _ = ray_origins.shape
    n_coarse = opts.num_proposal_steps
    k_strat, k_noise1, k_imp, k_noise2 = jax.random.split(key, 4)

    def s_to_t(s):
        return s * opts.ray_end + (1.0 - s) * opts.ray_start

    def eval_model(tdist, noise_key, token=None):
        # coords: [B, R, S, 3] -> [B, R*S, 3]
        coords = ray_origins[:, :, None, :] + tdist[..., None] * ray_directions[:, :, None, :]
        s = tdist.shape[-1]
        if token_aware:
            rgb, sigma, tok = run_model(coords.reshape(batch, num_rays * s, 3),
                                        token)
        else:
            rgb, sigma = run_model(coords.reshape(batch, num_rays * s, 3))
            tok = None
        if not (isinstance(density_noise, float) and density_noise == 0.0):
            sigma = sigma + jax.random.normal(noise_key, sigma.shape) * density_noise
        c = rgb.shape[-1]
        return (rgb.reshape(batch, num_rays, s, c),
                sigma.reshape(batch, num_rays, s), tok)

    # Coarse pass (in s-space [0, 1], ref :132-148).
    sdist_coarse = sample_stratified(k_strat, batch, num_rays, n_coarse,
                                     ray_marcher_type=opts.ray_marcher_type,
                                     jitter=jitter)
    tdist_coarse = s_to_t(sdist_coarse)
    colors_coarse, densities_coarse, tok = eval_model(tdist_coarse, k_noise1)

    if opts.num_fine_steps > 0:
        _, _, weights, _ = _march(colors_coarse, densities_coarse, sdist_coarse, opts)
        sdist_fine = sample_importance(k_imp, sdist_coarse, weights, opts.num_fine_steps,
                                       ray_marcher_type=opts.ray_marcher_type,
                                       det=not jitter)
        tdist_fine = s_to_t(sdist_fine)
        colors_fine, densities_fine, _ = eval_model(tdist_fine, k_noise2, tok)

        # both sample sets are sorted by construction -> sort-free merge
        all_depths, all_colors, all_densities = unify_samples_sorted(
            tdist_coarse, colors_coarse, densities_coarse,
            tdist_fine, colors_fine, densities_fine)
        rgb_final, depth_final, weights_sum, final_transmittance = _march_reduced(
            all_colors, all_densities, all_depths, opts)
    else:
        rgb_final, depth_final, weights_sum, final_transmittance = _march_reduced(
            colors_coarse, densities_coarse, sdist_coarse, opts)

    return rgb_final, depth_final, weights_sum, final_transmittance
