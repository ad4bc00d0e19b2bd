"""Typed, frozen configuration tree.

Mirrors the reference's hydra config groups (ref configs/**: camera/base.yaml,
model/3dgp.yaml, model/base.yaml, training/base.yaml, dataset/base.yaml) as
frozen dataclasses. Frozen means hashable, which lets configs ride along as
static attributes of flax modules and as jit closure constants.

Defaults reproduce the 3DGP ImageNet-256 configuration. The layered-YAML
loader with resolver support lives in tdgp.infra.experiment; this module is
the schema.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


def asdict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def replace(cfg, **kwargs):
    return dataclasses.replace(cfg, **kwargs)


# --------------------------------------------------------------- camera

@dataclass(frozen=True)
class Dist:
    """Scalar sampling distribution (ref configs/camera/base.yaml)."""
    dist: str = 'uniform'
    mean: float = 0.0
    std: float = 0.0
    min: float = 0.0
    max: float = 0.0


@dataclass(frozen=True)
class AnglesDist:
    dist: str = 'uniform'
    yaw: Dist = Dist()
    pitch: Dist = Dist()


@dataclass(frozen=True)
class OriginCfg:
    radius: Dist = Dist(dist='normal', mean=1.0, std=0.0)
    angles: AnglesDist = AnglesDist(
        dist='uniform',
        yaw=Dist(dist='uniform', min=-1.57, max=1.57),
        pitch=Dist(dist='uniform', min=0.785398163, max=2.35619449),
    )


@dataclass(frozen=True)
class LookAtCfg:
    radius: Dist = Dist(dist='uniform', min=0.0, max=0.2)
    angles: AnglesDist = AnglesDist(
        dist='spherical_uniform',
        yaw=Dist(dist='spherical_uniform', min=-3.14159265, max=3.14159265),
        pitch=Dist(dist='spherical_uniform', min=0.0, max=3.14159265),
    )


@dataclass(frozen=True)
class RayCfg:
    start: float = 0.75
    end: float = 1.25


@dataclass(frozen=True)
class CameraConfig:
    """ref configs/camera/base.yaml + camera/uniform.yaml."""
    ray: RayCfg = RayCfg()
    fov: Dist = Dist(dist='uniform', min=10.0, max=45.0)
    origin: OriginCfg = OriginCfg()
    look_at: LookAtCfg = LookAtCfg()
    cube_scale: float = 0.5
    validate_viewing_frustum: bool = False


# --------------------------------------------------------------- generator

@dataclass(frozen=True)
class TriPlaneMLPCfg:
    n_layers: int = 2
    hid_dim: int = 64


@dataclass(frozen=True)
class TriPlaneCfg:
    res: int = 512
    feat_dim: int = 32
    mlp: TriPlaneMLPCfg = TriPlaneMLPCfg()


@dataclass(frozen=True)
class DepthAdaptorCfg:
    """ref configs/model/3dgp.yaml:40-50."""
    enabled: bool = True
    kernel_size: int = 5
    hid_dim: int = 64
    num_hid_layers: int = 3
    out_strategy: str = 'random'  # 'last' | 'mean' | 'random'
    selection_start_p: float = 0.1
    anneal_kimg: int = 10000
    near_plane_offset_max_fraction: float = 0.25
    near_plane_offset_bias: float = -3.0


@dataclass(frozen=True)
class AdjustCfg:
    angles: bool = True
    radius: bool = False
    fov: bool = True
    look_at: bool = True


@dataclass(frozen=True)
class EMDCfg:
    enabled: bool = True
    anneal_kimg: int = 10000
    num_samples: int = 64
    origin: float = 2.0
    radius: float = 0.0
    fov: float = 0.0001
    look_at: float = 0.0001


@dataclass(frozen=True)
class LipschitzCfg:
    enabled: bool = False
    angles: float = 0.0
    radius: float = 0.0
    fov: float = 0.0
    look_at: float = 0.0


@dataclass(frozen=True)
class CameraAdaptorCfg:
    """ref configs/model/3dgp.yaml:52-76."""
    enabled: bool = True
    residual: bool = False
    lr_multiplier: float = 0.1
    z_dim: int = 512
    c_dim: int = 0
    hid_dim: int = 256
    embed_dim: int = 16
    adjust: AdjustCfg = AdjustCfg()
    emd: EMDCfg = EMDCfg()
    lipschitz_weights: LipschitzCfg = LipschitzCfg()
    force_mean_weight: float = 10.0


@dataclass(frozen=True)
class PatchCfg:
    """ref configs/training/base.yaml:33-44 + patch_beta.yaml."""
    enabled: bool = True
    patch_params_cond: bool = True
    distribution: str = 'beta'  # 'uniform' | 'discrete_uniform' | 'beta'
    resolution: int = 64
    min_scale_trg: float = 0.25   # patch_res / dataset_res
    max_scale: float = 1.0
    anneal_kimg: int = 10000
    alpha: float = 1.0
    beta_val_start: float = 0.001
    beta_val_end: float = 0.8
    mbstd_group_size: int = 4
    discrete_support: Tuple[float, ...] = ()


@dataclass(frozen=True)
class GeneratorConfig:
    """ref configs/model/base.yaml 'generator' + model/3dgp.yaml overrides."""
    z_dim: int = 512
    w_dim: int = 512
    c_dim: int = 0
    map_depth: int = 2
    cbase: int = 32768
    cmax: int = 512
    fmaps: float = 1.0
    img_resolution: int = 256
    img_channels: int = 3
    # 3dgp.yaml runs the generator fp32-only; on TPU the top num_fp16_res
    # decoder blocks run bf16 instead (wider exponent than the fp16 the
    # reference avoided; +1.5% step throughput and it halves the plane /
    # decoder-activation HBM at 512^2 — round-3 ledger). Parity tests pin
    # fp32_only=True explicitly where they compare against torch.
    num_fp16_res: int = 4
    fp32_only: bool = False
    architecture: str = 'skip'
    use_noise: bool = True
    num_ray_steps: int = 32
    max_batch_res: int = 128
    ray_marcher_type: str = 'classical'
    clamp_mode: str = 'softplus'
    density_bias: float = 0.0
    use_full_box: bool = False
    use_inf_depth: bool = True
    has_view_cond: bool = False
    nerf_noise_std_init: float = 1.0
    nerf_noise_kimg_growth: int = 5000
    camera_cond: bool = True        # 3D G conditions mapping on camera angles
    camera_cond_raw: bool = True    # camera_raw_scalars=True (ref networks_epigraf.py:283)
    camera_cond_drop_p: float = 0.0
    camera_cond_spoof_p: float = 0.5
    tri_plane: TriPlaneCfg = TriPlaneCfg()
    depth_adaptor: DepthAdaptorCfg = DepthAdaptorCfg()
    camera_adaptor: CameraAdaptorCfg = CameraAdaptorCfg()
    camera: CameraConfig = CameraConfig()
    patch: PatchCfg = PatchCfg()
    white_back: bool = False
    last_back: bool = False
    # tri-plane sampling implementation: 'auto' selects the Pallas splat
    # backward (tdgp/ops/splat.py) on TPU, pure-jnp elsewhere
    plane_sample_impl: str = 'auto'
    # forward gather packing (ops/splat.py): 'pair' halves the gather row
    # count for a 2x-planes transient table; 'quad' quarters it (4x table);
    # 'none' is the plain 4-corner gather; '*_bf16' stores the table (and
    # the splat kernel's entry rows / MXU products) in bf16. Measured on
    # v5e at satellite batch 8 (docs/DESIGN.md round-3 ledger): pair fp32
    # 5.26 imgs/s, pair_bf16 5.94, quad_bf16 6.05 — quad_bf16 is the
    # operating point (its 4x table fits once the plane-VJP is hoisted).
    # Only consulted by the fused TPU path; the jnp path ignores it.
    plane_pack: str = 'quad_bf16'
    # ray-march implementation: 'auto' selects the fused Pallas integration
    # kernel (ops/pallas_kernels.py:ray_march_fused) on TPU for the classical
    # marcher, pure-jnp elsewhere / for eval-only render features
    ray_march_impl: str = 'auto'
    # where the plane gather sits relative to the render remat region:
    #   'remat'     — inside (backward replays the gather; minimal memory)
    #   'save_bf16' — outside, corner-value residuals saved in bf16 (the
    #                 backward skips one full gather sweep per render pass
    #                 at ~0.8 GB/pass of residuals at satellite batch 8)
    #   'save_f32'  — outside, fp32 residuals
    # 'auto' resolves by measurement (docs/DESIGN.md round-3 ledger):
    # 'save_bf16' on the fused TPU path (quad_bf16+save_bf16 measured
    # 6.62 imgs/s vs 6.05 remat at satellite batch 8), 'remat' elsewhere
    sample_save: str = 'auto'
    # run the render streams (planes, plane features -> MLP -> marcher
    # rgb/sigma) in bf16. Ray/camera math and sample positions stay fp32
    # (plane coords at 512^2 exceed bf16's 8-bit mantissa). Used by the
    # Dmain fake render (training.dmain_fake_bf16), where no gradients
    # flow through G so only forward bandwidth matters.
    render_bf16: bool = False
    # rematerialize the tri-plane decoder in the backward pass (the round-2
    # memory lever that let batch 16 compile). OFF trades multiple GB of
    # saved SG2 activations for skipping one decoder replay per backward —
    # only viable at small batch after the bf16 diet (measure on-chip).
    decoder_remat: bool = True
    # merge the coarse+fine backward splats into ONE window table + ONE
    # unfold (ops/splat.py triplane_sample_pair_*: the fine pass's
    # cotangent rides a token back to the coarse op's backward). A pure
    # reassociation of the same fp32 sums — no precision change — saving
    # a zero-table init, a family-add and an unfold per differentiated
    # render. Requires the fused path with packing and a 'save' sample
    # mode. Default ON since the r5 battery (concat pair mode 10.22 vs
    # 9.75 imgs/s anchor at b16; DESIGN.md round-5 ledger); opt out per
    # run with generator.merged_splat=false.
    merged_splat: bool = True


@dataclass(frozen=True)
class DiscriminatorConfig:
    """ref configs/model/base.yaml 'discriminator' + model/3dgp.yaml."""
    c_dim: int = 0
    cbase: int = 32768
    cmax: int = 512
    fmaps: float = 1.0
    input_resolution: int = 64      # patch resolution when patch-wise
    img_channels: int = 4           # RGB + depth
    num_fp16_res: int = 4
    fp32_only: bool = False
    conv_clamp: float = 256.0
    num_additional_start_blocks: int = 2  # log2(dataset_res / patch_res)
    mbstd_group_size: int = 4
    mbstd_num_channels: int = 1
    logits_clamp_val: float = 1e7
    camera_cond: bool = False
    camera_cond_drop_p: float = 0.0
    hyper_mod: bool = True
    patch: PatchCfg = PatchCfg()
    embedding_dim: int = 2048       # KD feature head (resnet50)
    map_depth: int = 2


# --------------------------------------------------------------- training

@dataclass(frozen=True)
class KDCfg:
    weight: float = 1.0
    anneal_kimg: int = 100000
    loss_type: str = 'l2'  # 'l2' | 'kl'


@dataclass(frozen=True)
class LossConfig:
    """ref configs/model/base.yaml 'loss_kwargs' + model/3dgp.yaml."""
    adv_loss_type: str = 'non_saturating'  # | 'hinge'
    r1_gamma: float = 0.05
    r1_interval: int = 16
    # remat the D forward inside R1's inner grad: numerics-neutral, trades
    # a replayed D forward (R1 runs every r1_interval steps, so amortized
    # ~0) for the grad-of-grad liveness that is the v5e-16GB batch ceiling
    # (b24/b32 OOM at the step_r1 warmup, DESIGN.md battery9)
    r1_remat: bool = False
    # R1-ONLY microbatch size (None -> training.batch_gpu). The R1 phase's
    # grad-of-grad peak is the HBM ceiling, and R1 runs only every
    # r1_interval steps, so a smaller (slower) R1 micro is ~free on the
    # step cadence while the rest of the step keeps its larger micro —
    # the lever the reference's lazy regularization makes cheap
    # (ref training_loop.py:196-199). Must divide the local batch and be
    # a multiple of mbstd_group_size.
    r1_batch_gpu: Optional[int] = None
    pl_weight: float = 0.0
    pl_start_kimg: int = 0
    pl_batch_shrink: int = 2
    pl_decay: float = 0.01
    blur_init_sigma: float = 10.0
    blur_fade_kimg: int = 200
    style_mixing_prob: float = 0.0
    kd: KDCfg = KDCfg()


@dataclass(frozen=True)
class OptimCfg:
    lr: float = 0.0025
    beta1: float = 0.0
    beta2: float = 0.99
    eps: float = 1e-8
    grad_clip: Optional[float] = None


@dataclass(frozen=True)
class AugmentCfg:
    """ref configs/training/base.yaml 'augment'."""
    mode: str = 'noaug'  # 'noaug' | 'ada' | 'fixed'
    p: float = 0.2
    target: float = 0.6
    ada_interval: int = 4
    ada_kimg: int = 500
    xflip: float = 0.0
    rotate90: float = 1.0
    xint: float = 1.0
    scale: float = 1.0
    rotate: float = 1.0
    aniso: float = 1.0
    xfrac: float = 1.0
    brightness: float = 1.0
    contrast: float = 1.0
    lumaflip: float = 1.0
    hue: float = 1.0
    saturation: float = 1.0
    # ref augment.py defaults — 0 in every shipped 3DGP config, selectable
    imgfilter: float = 0.0
    noise: float = 0.0
    cutout: float = 0.0


@dataclass(frozen=True)
class TrainingConfig:
    """ref configs/training/base.yaml."""
    batch_size: int = 64
    batch_gpu: Optional[int] = None
    test_batch_gpu: int = 4
    # Dmain's fake generation differentiates nothing through G (ref
    # loss.py:256-262 runs G under no sync + detach), so the whole fake
    # render can run at bf16 bandwidth: a bf16-view Generator (same params,
    # all-bf16 decoder blocks + render_bf16 streams) generates the fakes D
    # trains against. Gmain fakes stay at the generator's own precision.
    # Default OFF until measured on-chip (perf knob, slight D-input shift).
    dmain_fake_bf16: bool = False
    # Reuse Gmain's rendered fakes (stop-gradient'd) as Dmain's fakes
    # instead of rendering a fresh batch — removes one full G forward
    # (decoder + table + 2 gather sweeps + MLP + marcher) per step. Deviates
    # from the reference, which draws fresh z and renders from the
    # just-updated G for Dmain (loss.py:259-262): here D trains against
    # pre-update-G fakes from the same z that G's step used. Default ON
    # since round 4: measured +33% step throughput at b16 (7.31→9.76
    # imgs/s, experiments/r4_measure.log) AND FID-clean on the 60-kimg
    # synth64 A/B (experiments/r4_ab.log: proxy-FID 94.9 control vs 51.8
    # reuse at 60 kimg; early snapshots within noise). Set false to get
    # the reference's fresh post-update Dmain fakes. Takes precedence over
    # dmain_fake_bf16 (with no Dmain render there is nothing to bf16).
    dmain_reuse_fakes: bool = True
    # Run Gmain's DIFFERENTIATED render (and PL reg) through a render_bf16
    # Generator view: bf16 plane storage + gather/MLP streams in the path
    # gradients flow through. Params stay fp32 masters (runtime casts;
    # grads accumulate fp32 through the cast transpose). Touches training
    # numerics — a synth dynamics A/B must show FID-neutrality before this
    # becomes an operating point (round-4 candidate, TODO.md #9).
    gmain_render_bf16: bool = False
    use_depth: bool = True
    blur_real_depth_sigma: float = 0.0
    learn_camera_dist: bool = True
    total_kimg: int = 25000
    tick_kimg: int = 4
    val_freq: int = 100
    snap: int = 100
    image_snap: int = 100
    seed: int = 0
    ema_kimg: float = 20.0          # batch_size * 0.3125
    ema_rampup: Optional[float] = 0.05
    ema_start_kimg: float = 0.0
    metrics: Tuple[str, ...] = ('fid2k_full', 'nfs256')
    resume: str = 'latest'
    tensorboard: bool = True        # TB sink (ref training_loop.py:270-275)
    run_profiling: bool = False     # jax.profiler trace of ticks 1-2 (ref infra.yaml:15)
    # host-RSS watchdog: snapshot + clean exit when the process RSS crosses
    # this (GB); the restart chain resumes from --run-dir. Safety net for
    # the tunneled device client's per-step host-RAM leak (r5 flagship
    # leg 2: 111 GB in 4 h -> host thrash). None/0 disables.
    max_rss_gb: Optional[float] = 100.0
    # ship raw u8 images / u16 depth to the device and normalize in-step
    # (bit-identical; 4x fewer transfer bytes per step -> 4x slower client
    # staging leak + less tunnel traffic). False = host-side float32
    # normalization (the reference's training_loop.py:296-300 placement).
    compact_transfer: bool = True
    g_optim: OptimCfg = OptimCfg(lr=0.0025)
    d_optim: OptimCfg = OptimCfg(lr=0.002)
    augment: AugmentCfg = AugmentCfg()


@dataclass(frozen=True)
class DatasetConfig:
    """ref configs/dataset/base.yaml."""
    path: str = ''
    name: str = 'dataset'
    resolution: int = 256
    c_dim: int = 0
    mirror: bool = True
    white_back: bool = False
    last_back: bool = False
    use_embeddings: bool = True
    embedder_name: str = 'resnet50'
    embedding_dim: int = 2048
    embeddings_path: str = ''
    embeddings_desc_path: str = ''
    max_size: Optional[int] = None


@dataclass(frozen=True)
class Config:
    """Top-level experiment config (ref configs/config.yaml composition)."""
    camera: CameraConfig = CameraConfig()
    generator: GeneratorConfig = GeneratorConfig()
    discriminator: DiscriminatorConfig = DiscriminatorConfig()
    loss: LossConfig = LossConfig()
    training: TrainingConfig = TrainingConfig()
    dataset: DatasetConfig = DatasetConfig()
    model_name: str = '3dgp'  # '3dgp' | 'epigraf' | 'stylegan2'
    num_devices: int = 1
    run_dir: str = 'experiments/run'


def imagenet_config() -> Config:
    """The headline ImageNet-256 config (README.md:55-57: cbase 65536, cmax 1024)."""
    cam = CameraConfig()
    gen = GeneratorConfig(cbase=65536, cmax=1024, c_dim=1000, camera=cam,
                          camera_adaptor=CameraAdaptorCfg(c_dim=1000))
    disc = DiscriminatorConfig(cbase=65536, cmax=1024, c_dim=1000)
    return Config(camera=cam, generator=gen, discriminator=disc,
                  dataset=DatasetConfig(c_dim=1000, resolution=256),
                  loss=LossConfig(r1_gamma=0.05))


def satellite_config(c_dim: int = 0, resolution: int = 256) -> Config:
    """dogs/horses/elephants config: default cbase/cmax (README.md:61)."""
    n_extra = max(0, (resolution // 64).bit_length() - 1)
    gen = GeneratorConfig(c_dim=c_dim, img_resolution=resolution,
                          camera_adaptor=CameraAdaptorCfg(c_dim=c_dim))
    disc = DiscriminatorConfig(c_dim=c_dim, num_additional_start_blocks=n_extra)
    return Config(generator=gen, discriminator=disc,
                  dataset=DatasetConfig(c_dim=c_dim, resolution=resolution))


def stylegan2_config(c_dim: int = 0, resolution: int = 256) -> Config:
    """2D StyleGAN2 baseline (ref configs/model/stylegan2.yaml): no depth, no
    camera learning, path-length + style-mixing regularization on."""
    gen = GeneratorConfig(c_dim=c_dim, img_resolution=resolution,
                          depth_adaptor=DepthAdaptorCfg(enabled=False),
                          camera_adaptor=CameraAdaptorCfg(enabled=False, c_dim=c_dim))
    disc = DiscriminatorConfig(c_dim=c_dim, img_channels=3)
    return Config(
        model_name='stylegan2', generator=gen, discriminator=disc,
        loss=LossConfig(pl_weight=2.0, style_mixing_prob=0.9,
                        kd=KDCfg(weight=0.0)),
        training=TrainingConfig(use_depth=False, learn_camera_dist=False),
        dataset=DatasetConfig(c_dim=c_dim, resolution=resolution,
                              use_embeddings=False))


def synth_demo_config() -> Config:
    """Small 64^2 config for the training-dynamics demo on the synthetic
    sphere dataset (data_scripts/make_synthetic_dataset.py): full 3DGP
    pipeline (patches, adaptors, R1) at sizes that train visibly within
    an hour on one chip. KD is off (the synthetic set has no ResNet
    embeddings)."""
    cam = CameraConfig()
    tri = TriPlaneCfg(res=128, feat_dim=16, mlp=TriPlaneMLPCfg(n_layers=2, hid_dim=32))
    patch = PatchCfg(resolution=32, min_scale_trg=0.5, anneal_kimg=100,
                     mbstd_group_size=4)
    gen = GeneratorConfig(
        z_dim=128, w_dim=128, c_dim=4, cbase=8192, cmax=256, img_resolution=64,
        num_ray_steps=16, tri_plane=tri, patch=patch, camera=cam,
        fp32_only=True,  # demo-scale: bf16 buys nothing at 128^2 planes
        nerf_noise_kimg_growth=100,
        depth_adaptor=DepthAdaptorCfg(hid_dim=16, num_hid_layers=2,
                                      kernel_size=3, anneal_kimg=100),
        camera_adaptor=CameraAdaptorCfg(z_dim=128, c_dim=4, hid_dim=64,
                                        embed_dim=8))
    disc = DiscriminatorConfig(
        c_dim=4, cbase=8192, cmax=256, input_resolution=32, img_channels=4,
        num_additional_start_blocks=1, mbstd_group_size=4, patch=patch,
        embedding_dim=0)
    return Config(
        camera=cam, generator=gen, discriminator=disc,
        loss=LossConfig(r1_gamma=0.1, kd=KDCfg(weight=0.0),
                        blur_fade_kimg=20),
        training=TrainingConfig(batch_size=32, ema_kimg=10.0, tick_kimg=2,
                                snap=5, image_snap=5, val_freq=5,
                                metrics=('fid2k_full',),
                                # 4000 images -> D overfits without ADA (a
                                # no-ADA 30-kimg run showed signs/real 0.91
                                # and G loss climbing); ada_kimg shortened to
                                # react within the demo's 200 kimg
                                augment=AugmentCfg(mode='ada', ada_kimg=100)),
        dataset=DatasetConfig(resolution=64, c_dim=4, use_embeddings=False),
    )


def synth256_config() -> Config:
    """Flagship-shape dynamics config: satellite channel widths at 256^2
    with 64^2 patches — the exact shape whose throughput bench.py measures —
    on the 256^2 synthetic sphere dataset (make_synthetic_dataset --res 256).

    Differences from `satellite` are only what the synthetic set forces
    (KD off, no embeddings, c_dim=4) plus compressed schedules (100-kimg
    anneals) so patch-scale annealing, nerf-noise growth, depth-adaptor
    fade and ADA all ENGAGE within a ~100-200 kimg demo run instead of the
    reference's 10 Mimg production horizons."""
    cfg = satellite_config(c_dim=4, resolution=256)
    patch = dataclasses.replace(cfg.generator.patch, anneal_kimg=100)
    gen = dataclasses.replace(
        cfg.generator, patch=patch, nerf_noise_kimg_growth=100,
        depth_adaptor=dataclasses.replace(cfg.generator.depth_adaptor,
                                          anneal_kimg=100))
    return dataclasses.replace(
        cfg, generator=gen,
        discriminator=dataclasses.replace(cfg.discriminator, embedding_dim=0),
        loss=dataclasses.replace(cfg.loss, kd=KDCfg(weight=0.0)),
        training=TrainingConfig(batch_size=16, tick_kimg=2,
                                snap=5, image_snap=5, val_freq=5,
                                metrics=('fid2k_full',),
                                # 2000 images: D overfits without ADA (same
                                # finding as the synth64 runs)
                                augment=AugmentCfg(mode='ada', ada_kimg=100)),
        dataset=DatasetConfig(path='data/synth256', name='synth256',
                              resolution=256, c_dim=4, use_embeddings=False),
    )


def tiny_test_config() -> Config:
    """A miniature config for unit tests / CI: everything shrunk."""
    cam = CameraConfig()
    tri = TriPlaneCfg(res=32, feat_dim=8, mlp=TriPlaneMLPCfg(n_layers=2, hid_dim=16))
    patch = PatchCfg(resolution=16, min_scale_trg=0.25, mbstd_group_size=2)
    gen = GeneratorConfig(
        z_dim=32, w_dim=32, c_dim=4, cbase=1024, cmax=64, img_resolution=64,
        num_ray_steps=4, tri_plane=tri, patch=patch, camera=cam,
        fp32_only=True,  # tests exercise numerics at fp32
        depth_adaptor=DepthAdaptorCfg(hid_dim=8, num_hid_layers=2, kernel_size=3),
        camera_adaptor=CameraAdaptorCfg(z_dim=32, c_dim=4, hid_dim=16, embed_dim=8),
    )
    disc = DiscriminatorConfig(
        c_dim=4, cbase=1024, cmax=64, input_resolution=16, img_channels=4,
        num_additional_start_blocks=2, mbstd_group_size=2, patch=patch,
        embedding_dim=16)
    return Config(
        camera=cam, generator=gen, discriminator=disc,
        loss=LossConfig(r1_gamma=0.1),
        training=TrainingConfig(batch_size=4, ema_kimg=1.25,
                                metrics=()),
        dataset=DatasetConfig(resolution=64, c_dim=4, embedding_dim=16),
    )
