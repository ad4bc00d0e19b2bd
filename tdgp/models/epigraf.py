"""EpiGRAF-style tri-plane NeRF generator — the 3DGP flagship model.

Counterpart of ref src/training/networks_epigraf.py. A StyleGAN2 stack
decodes w into three 512²x32 feature planes; rays sample the planes
(bilinear, align_corners=True), a tiny MLP maps averaged plane features to
(rgb, sigma), and a two-pass importance renderer integrates along rays.
Depth maps pass through the DepthAdaptor to become D's 4th channel.

Design differences from the reference (all TPU-motivated):
  - everything is one pure function; schedules (nerf_noise_std, depth
    adaptor progress) enter as traced scalars so one compiled step serves
    the whole training run
  - patch rendering keeps static shapes: the ray grid is always
    resolution², scaled/offset per-sample in NDC
  - eval-time ray chunking (`run_batchwise`, ref training_utils.py:171-203)
    is replaced by jax.lax.map over a static chunk axis when
    ray_chunk is set.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tdgp.config import GeneratorConfig
from tdgp.models.camera_adaptor import CameraAdaptor
from tdgp.models.depth_adaptor import DepthAdaptor
from tdgp.models.layers import FullyConnected, MappingNetwork
from tdgp.models.stylegan2 import SynthesisBlocksSequence, sg2_num_ws
from tdgp.ops.grid_sample import grid_sample_2d
from tdgp.ops.splat import triplane_sample_fused
from tdgp.rendering.camera import compute_cam2world_matrix
from tdgp.rendering.rays import sample_rays
from tdgp.rendering.renderer import RenderOptions, importance_render
from tdgp.utils.tensor_group import TensorGroup


def flatten_planes(planes: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, 3, F] -> [N*3, H, W, F]. A real 400MB data movement at the
    full config — hoisted out of the (rematerialized) per-pass sampling so it
    runs once per synthesis call, not once per pass per direction."""
    n, h, w, _, f = planes.shape
    return planes.transpose(0, 3, 1, 2, 4).reshape(n * 3, h, w, f)


def resolve_sample_impl(impl: str, h: int, w: int) -> str:
    """'auto' -> the Pallas-splat fused path on TPU when the plane shape
    satisfies the splat kernel's tiling, pure-jnp elsewhere."""
    if impl != 'auto':
        return impl
    on_tpu = jax.default_backend() in ('tpu', 'axon')
    return 'fused' if (on_tpu and w % 128 == 0 and h % 2 == 0) else 'jnp'


def resolve_sample_save(mode: str, impl: str = 'jnp') -> str:
    """'auto' -> 'save_bf16' on the fused TPU path, 'remat' elsewhere.

    Measured on v5e at satellite batch 8 (docs/DESIGN.md round-3 ledger):
    save_bf16 trades ~0.8 GB/pass of bf16 corner residuals for one full
    gather sweep per render pass in the backward — 6.62 vs 6.05 imgs/s
    with quad_bf16 packing. The jnp path keeps 'remat' (its autodiff
    residuals are the full gather outputs; CPU/GPU memory profiles differ).
    """
    if mode != 'auto':
        return mode
    return 'save_bf16' if impl in ('fused', 'fused_interpret') else 'remat'


def tri_plane_sample(planes, coords: jnp.ndarray, scale: float,
                     impl: str = 'jnp', pack: str = 'pair') -> jnp.ndarray:
    """Sample 3 axis-aligned planes at 3D points and average them
    (ref tri_plane_renderer.py:560-585 + the MLP's plane-mean, networks_epigraf.py:54).

    Averaging here (instead of materializing [N, 3, P, F] and reducing in the
    MLP) removes the largest temporary of the render pass — the downstream
    MLP is linear in its first layer, so mean-then-MLP == MLP-then-mean of
    the reference.

    planes: [N, H, W, 3, F] or pre-flattened [N*3, H, W, F];
    coords: [N, P, 3] world coords; scale: cube half-side. Returns [N, P, F].
    """
    if planes.ndim == 5:
        planes = flatten_planes(planes)
    n3, h, w, f = planes.shape
    n = n3 // 3
    p = coords.shape[1]
    # impl: 'jnp' (XLA gather + autodiff scatter VJP), 'fused' (Pallas splat
    # backward, tdgp/ops/splat.py — ~7x faster grad on TPU), or 'auto'
    impl = resolve_sample_impl(impl, h, w)
    if impl in ('fused', 'fused_interpret'):
        return triplane_sample_fused(planes, coords, scale,
                                     impl == 'fused_interpret', pack)
    assert impl == 'jnp', impl
    coords = coords / scale
    # plane projections: x/y, x/z, y/z (ref :577-581)
    grids = jnp.stack([
        coords[..., jnp.array([0, 1])],
        coords[..., jnp.array([0, 2])],
        coords[..., jnp.array([1, 2])],
    ], axis=1)  # [N, 3, P, 2]
    feats = grid_sample_2d(planes, grids.reshape(n * 3, p, 2), align_corners=True)
    return jnp.mean(feats.reshape(n, 3, p, f), axis=1)


class TriPlaneMLP(nn.Module):
    """Plane features -> (rgb, sigma) (ref networks_epigraf.py:29-68)."""
    cfg: GeneratorConfig
    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [N, P, feat_dim] plane-averaged features
        -> (rgb [N, P, out_dim], sigma [N, P])."""
        mlp = self.cfg.tri_plane.mlp
        assert mlp.n_layers >= 2, "need >= 2 layers (ref networks_epigraf.py:42)"
        hid = mlp.hid_dim
        out_total = self.out_dim + 1
        dims = [hid] * (mlp.n_layers - 1) + [out_total]
        acts = ['lrelu'] * (mlp.n_layers - 1) + ['linear']
        for i, (d, a) in enumerate(zip(dims, acts)):
            x = FullyConnected(d, activation=a, name=f'fc{i}')(x)

        if self.cfg.ray_marcher_type == 'mip':
            rgb = nn.sigmoid(x[..., :-1]) * (1 + 2 * 0.001) - 0.001  # MipNeRF clamp (ref :62)
        elif self.cfg.ray_marcher_type == 'classical':
            rgb = x[..., :-1]
        else:
            raise NotImplementedError(self.cfg.ray_marcher_type)
        return rgb, x[..., -1]


class SynthesisNetwork(nn.Module):
    """Tri-plane decoder + renderer + depth adaptor (ref networks_epigraf.py:133-261)."""
    cfg: GeneratorConfig

    @property
    def num_ws(self) -> int:
        return sg2_num_ws(0, self.cfg.tri_plane.res)

    def setup(self):
        c = self.cfg
        self.tri_plane_decoder = SynthesisBlocksSequence(
            w_dim=c.w_dim, in_resolution=0, out_resolution=c.tri_plane.res,
            in_channels=0, out_channels=c.tri_plane.feat_dim * 3,
            cbase=c.cbase, cmax=c.cmax, fmaps=c.fmaps, architecture='skip',
            use_noise=c.use_noise, num_fp16_res=c.num_fp16_res, fp32_only=c.fp32_only,
            name='tri_plane_decoder')
        self.tri_plane_mlp = TriPlaneMLP(c, out_dim=c.img_channels, name='tri_plane_mlp')
        if c.depth_adaptor.enabled:
            self.depth_adaptor = DepthAdaptor(
                c.depth_adaptor, min_depth=c.camera.ray.start, max_depth=c.camera.ray.end,
                name='depth_adaptor')
        else:
            self.depth_adaptor = None
        if c.camera_adaptor.enabled:
            self.camera_adaptor = CameraAdaptor(c.camera_adaptor, c.camera,
                                                name='camera_adaptor')
        else:
            self.camera_adaptor = None

    def _render_opts(self, cut_quantile: float = 0.0) -> RenderOptions:
        c = self.cfg
        march_impl = c.ray_march_impl
        if march_impl == 'auto':
            # measured on v5e (scripts/testing/probe_ray_march_fused.py): the
            # Pallas marcher and the XLA-fused jnp marcher run at identical
            # speed (~31 ms/call at 32k rays x 64 steps — both call-overhead/
            # HBM bound), while the Mosaic compile costs ~3 min per shape.
            # 'auto' therefore resolves to 'jnp'; 'fused' stays selectable.
            march_impl = 'jnp'
        return RenderOptions(
            num_proposal_steps=c.num_ray_steps, num_fine_steps=c.num_ray_steps,
            ray_start=c.camera.ray.start, ray_end=c.camera.ray.end,
            box_size=c.camera.cube_scale * 2, ray_marcher_type=c.ray_marcher_type,
            clamp_mode=c.clamp_mode, use_inf_depth=c.use_inf_depth,
            last_back=c.last_back, white_back=c.white_back,
            density_bias=c.density_bias, cut_quantile=cut_quantile,
            march_impl=march_impl)

    def decode_planes(self, ws: jnp.ndarray, noise_mode: str = 'random') -> jnp.ndarray:
        """ws -> [N, H, W, 3, F] tri-planes.

        The SG2 stack is rematerialized in the backward pass: its forward is
        ~57 ms (healthy MXU utilization) while its saved activations are
        multiple GB at 512² — the planes themselves are the only residual
        worth keeping (same reasoning as the render-closure remat below).
        """
        c = self.cfg

        def run(dec, ws_):
            return dec(ws_, noise_mode=noise_mode)

        if c.decoder_remat:
            out = nn.remat(run)(self.tri_plane_decoder, ws[:, :self.num_ws])
        else:
            out = run(self.tri_plane_decoder, ws[:, :self.num_ws])
        n, h, w, _ = out.shape
        return out.reshape(n, h, w, 3, c.tri_plane.feat_dim)

    def apply_camera_adaptor(self, camera_params: TensorGroup, z: jnp.ndarray,
                             c: Optional[jnp.ndarray] = None) -> TensorGroup:
        assert self.camera_adaptor is not None
        return self.camera_adaptor(camera_params, z, c)

    def compute_densities(self, ws: jnp.ndarray, coords: jnp.ndarray,
                          noise_mode: str = 'const') -> jnp.ndarray:
        """Density at arbitrary points, for geometry extraction
        (ref networks_epigraf.py:196-208). coords: [N, P, 3] -> sigma [N, P]."""
        planes = self.decode_planes(ws, noise_mode=noise_mode)
        feats = tri_plane_sample(planes, coords, scale=self.cfg.camera.cube_scale,
                                 impl=self.cfg.plane_sample_impl,
                                 pack=self.cfg.plane_pack)
        _, sigma = self.tri_plane_mlp(feats)
        return sigma

    def __call__(self, ws: jnp.ndarray, camera_params: TensorGroup,
                 patch_params: Optional[Dict[str, jnp.ndarray]] = None, *,
                 train: bool = False, noise_mode: str = 'random',
                 concat_depth: bool = False, return_depth: bool = False,
                 return_depth_adapted: bool = False,
                 nerf_noise_std: jnp.ndarray | float = 0.0,
                 depth_progress: jnp.ndarray | float = 1.0,
                 cut_quantile: float = 0.0,
                 resolution: Optional[int] = None,
                 ray_chunk: Optional[int] = None) -> Any:
        """ref networks_epigraf.py:210-261.

        resolution: override output resolution (defaults: patch res when
        training with patches, img_resolution otherwise).
        """
        c = self.cfg
        n = ws.shape[0]
        if resolution is None:
            resolution = (c.patch.resolution if (train and c.patch.enabled)
                          else c.img_resolution)
        h = w = resolution

        planes = flatten_planes(self.decode_planes(ws, noise_mode=noise_mode))
        if c.render_bf16:
            # bf16 plane storage halves the gather/table-build bandwidth;
            # coords below stay fp32 (bilinear weights need the mantissa)
            planes = planes.astype(jnp.bfloat16)

        c2w = compute_cam2world_matrix(camera_params)
        ray_o, ray_d = sample_rays(c2w, camera_params.fov, resolution=(w, h),
                                   patch_params=patch_params)
        opts = self._render_opts(cut_quantile=cut_quantile)

        # remat: recompute the MLP (and, under 'remat' save mode, the plane
        # gathers too) in the backward pass instead of storing activations
        # for every ray sample (two passes x 64 steps) — trades cheap FLOPs
        # for the dominant HBM cost of training. Under 'save_bf16'/'save_f32'
        # the gather sits OUTSIDE the remat region: its corner-value
        # residuals are saved so the backward skips one gather sweep per
        # pass (the splat plane-gradient needs only coords + cotangents).
        impl = resolve_sample_impl(c.plane_sample_impl, planes.shape[1],
                                   planes.shape[2])
        save_mode = resolve_sample_save(c.sample_save, impl)
        residual_dtype = 'bf16' if save_mode == 'save_bf16' else 'table'
        if impl in ('fused', 'fused_interpret') and c.plane_pack != 'none':
            # hoist the packed-table build OUT of the remat region: built
            # once per step instead of once per pass per direction (4x).
            # The table is a stop_gradient'd cache — the plane gradient goes
            # DIRECTLY through triplane_sample_hoisted's splat backward
            # (the table-cotangent route made XLA materialize 4x-padded
            # build-VJP transposes, 12 GB at satellite batch-8 'quad')
            from tdgp.ops.splat import build_sample_table, triplane_sample_hoisted
            pshape = tuple(planes.shape)
            table = jax.lax.stop_gradient(build_sample_table(planes, c.plane_pack))
            operand = (planes, table)

            def sample_fn(operand_, coords):
                planes_, table_ = operand_
                return triplane_sample_hoisted(
                    planes_, table_, coords, c.camera.cube_scale, pshape,
                    c.plane_pack, impl == 'fused_interpret', residual_dtype)
        else:
            operand = planes

            def sample_fn(planes_, coords):
                return tri_plane_sample(planes_, coords,
                                        scale=c.camera.cube_scale,
                                        impl=impl, pack=c.plane_pack)

        # feats -> MLP in bf16 when render_bf16: FullyConnected follows its
        # input dtype, so the [P, F] stream and both matmuls run bf16
        feat_dtype = jnp.bfloat16 if c.render_bf16 else None

        def _cast(feats):
            return feats.astype(feat_dtype) if feat_dtype is not None else feats

        # merged coarse+fine backward splat (GeneratorConfig.merged_splat):
        # the coarse sample op emits a token, the fine op consumes it, and
        # BOTH passes' plane gradients accumulate into one window table in
        # the coarse op's backward (ops/splat.py triplane_sample_pair_*).
        # Needs the hoisted-table path (fused + packing) and a 'save'
        # sample mode (the token must not cross a remat boundary).
        token_aware = (c.merged_splat
                       and impl in ('fused', 'fused_interpret')
                       and c.plane_pack != 'none'
                       and save_mode in ('save_bf16', 'save_f32')
                       and opts.num_fine_steps > 0)
        if token_aware:
            from tdgp.ops.splat import (triplane_sample_pair_first,
                                        triplane_sample_pair_second)

            def _mlp_only(mlp, feats):
                return mlp(feats)

            _mlp_remat = nn.remat(_mlp_only)
            n_coarse, n_fine = opts.num_proposal_steps, opts.num_fine_steps

            def run_model(coords, token=None):
                planes_, table_ = operand
                if token is None:
                    p_fine = (coords.shape[1] // n_coarse) * n_fine
                    feats, tok = triplane_sample_pair_first(
                        planes_, table_, coords, p_fine, c.camera.cube_scale,
                        pshape, c.plane_pack, impl == 'fused_interpret',
                        residual_dtype)
                else:
                    feats = triplane_sample_pair_second(
                        table_, coords, token, c.camera.cube_scale, pshape,
                        c.plane_pack, impl == 'fused_interpret',
                        residual_dtype)
                    tok = None
                rgb, sigma = _mlp_remat(self.tri_plane_mlp, _cast(feats))
                return rgb, sigma, tok
        elif save_mode in ('save_bf16', 'save_f32'):
            def _mlp_only(mlp, feats):
                return mlp(feats)

            _mlp_remat = nn.remat(_mlp_only)

            def run_model(coords):
                feats = _cast(sample_fn(operand, coords))
                return _mlp_remat(self.tri_plane_mlp, feats)
        else:
            assert save_mode == 'remat', save_mode

            def _run(mlp, operand_, coords):
                return mlp(_cast(sample_fn(operand_, coords)))

            _run_remat = nn.remat(_run)

            def run_model(coords):
                return _run_remat(self.tri_plane_mlp, operand, coords)

        key = self.make_rng('render') if train else jax.random.PRNGKey(0)
        noise_std = nerf_noise_std if train else 0.0
        jitter = train  # deterministic mid-bin sampling at eval

        if ray_chunk is not None and h * w > ray_chunk:
            assert (h * w) % ray_chunk == 0
            ro = ray_o.reshape(n, (h * w) // ray_chunk, ray_chunk, 3).transpose(1, 0, 2, 3)
            rd = ray_d.reshape(n, (h * w) // ray_chunk, ray_chunk, 3).transpose(1, 0, 2, 3)

            def chunk_fn(args):
                o, d = args
                rgb, depth, wt, ft = importance_render(run_model, o, d, key, opts,
                                                       density_noise=noise_std,
                                                       jitter=jitter,
                                                       token_aware=token_aware)
                return rgb, depth
            rgb, depth = jax.lax.map(chunk_fn, (ro, rd))
            rgb = rgb.transpose(1, 0, 2, 3).reshape(n, h * w, -1)
            depth = depth.transpose(1, 0, 2).reshape(n, h * w)
        else:
            rgb, depth, _wt, _ft = importance_render(run_model, ray_o, ray_d, key, opts,
                                                     density_noise=noise_std,
                                                     jitter=jitter,
                                                     token_aware=token_aware)

        img = rgb.reshape(n, h, w, c.img_channels)
        depth = depth.reshape(n, h, w, 1)

        depth_adapted = None
        if self.depth_adaptor is not None:
            depth_adapted = self.depth_adaptor(depth, ws[:, 0], progress=depth_progress,
                                               train=train)
            if concat_depth:
                img = jnp.concatenate([img, depth_adapted], axis=-1)

        if return_depth or return_depth_adapted:
            out = TensorGroup(img=img)
            if return_depth:
                out.depth = depth
            if return_depth_adapted:
                out.depth_adapted = depth_adapted
            return out
        return img


class Generator(nn.Module):
    """Full 3DGP generator: mapping + tri-plane synthesis (ref networks_epigraf.py:265-291)."""
    cfg: GeneratorConfig

    @property
    def num_ws(self) -> int:
        return sg2_num_ws(0, self.cfg.tri_plane.res)

    def setup(self):
        c = self.cfg
        self.synthesis = SynthesisNetwork(c, name='synthesis')
        self.mapping = MappingNetwork(
            z_dim=c.z_dim, c_dim=c.c_dim, w_dim=c.w_dim, num_ws=self.num_ws,
            num_layers=c.map_depth, camera_cond=c.camera_cond,
            camera_cond_drop_p=c.camera_cond_drop_p,
            camera_raw_scalars=c.camera_cond_raw, name='mapping')

    def map_ws(self, z, c, camera_angles=None, truncation_psi=1.0,
               truncation_cutoff=None, update_emas=False, train=False):
        return self.mapping(z, c, camera_angles=camera_angles,
                            truncation_psi=truncation_psi,
                            truncation_cutoff=truncation_cutoff,
                            update_emas=update_emas, train=train)

    def __call__(self, z: jnp.ndarray, c: Optional[jnp.ndarray],
                 camera_params: TensorGroup,
                 camera_angles_cond: Optional[jnp.ndarray] = None,
                 truncation_psi: float = 1.0, truncation_cutoff: Optional[int] = None,
                 update_emas: bool = False, train: bool = False, **synthesis_kwargs):
        ws = self.mapping(z, c, camera_angles=camera_angles_cond,
                          truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff,
                          update_emas=update_emas, train=train)
        return self.synthesis(ws, camera_params, train=train, **synthesis_kwargs)
