"""The jitted G/D train step, data-parallel over a device mesh.

Counterpart of ref src/training/training_loop.py:187-366 + loss.py
accumulate_gradients, redesigned for XLA:

  - ONE compiled function executes Gmain + Dmain (+ R1 every
    `r1_interval` steps, as a second compiled variant) — no per-phase python
    dispatch, no flat-tensor all_reduce dance (ref training_loop.py:335-344):
    gradients are `lax.pmean`ed inside shard_map over the 'data' mesh axis
  - gen-side randomness (z, cameras, patches, GPC spoofing) is sampled
    on-device from a per-shard PRNG (reference sampled on host numpy)
  - lazy regularization keeps the reference's exact optimizer semantics:
    D's Adam hyperparams are scaled by mb_ratio = r1_interval/(r1_interval+1)
    (ref training_loop.py:196-199), R1 runs as its own optimizer step with
    gain = r1_interval
  - G EMA is a tree-lerp with the rampup-corrected beta (ref :356-366)
  - grads are NaN/Inf-scrubbed exactly like the reference's
    misc.nan_to_num(flat) stability hack (ref :341).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from tdgp.config import Config, asdict
from tdgp.models.discriminator import Discriminator
from tdgp.models.epigraf import Generator
from tdgp.rendering.camera import sample_camera_params
from tdgp.training import losses
from tdgp.training.patch import extract_patches, sample_patch_params, sample_random_c
from tdgp.training.schedules import Schedules
from tdgp.utils.misc import nan_to_num
from tdgp.utils.tensor_group import TensorGroup


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    g_params: Any
    g_consts: Any
    g_ema_coll: Any      # mapping w_avg etc. ('ema' collection)
    d_params: Any
    ema_params: Any      # EMA copy of g_params
    ema_ema_coll: Any
    g_opt: Any
    d_opt: Any
    pl_mean: jnp.ndarray


def g_variables(state: TrainState) -> Dict[str, Any]:
    return {'params': state.g_params, 'consts': state.g_consts, 'ema': state.g_ema_coll}


def ema_variables(state: TrainState) -> Dict[str, Any]:
    return {'params': state.ema_params, 'consts': state.g_consts, 'ema': state.ema_ema_coll}


def build_models(cfg: Config):
    """Model dispatch (ref train.py:198-228): '3dgp'/'epigraf' -> tri-plane
    Generator; 'stylegan2' -> the 2D baseline."""
    if cfg.model_name == 'stylegan2':
        from tdgp.models.stylegan2 import StyleGAN2Generator
        gc = cfg.generator
        G = StyleGAN2Generator(
            z_dim=gc.z_dim, c_dim=gc.c_dim, w_dim=gc.w_dim,
            img_resolution=gc.img_resolution, img_channels=gc.img_channels,
            map_depth=gc.map_depth, cbase=gc.cbase, cmax=gc.cmax, fmaps=gc.fmaps,
            num_fp16_res=gc.num_fp16_res, fp32_only=gc.fp32_only)
    else:
        G = Generator(cfg.generator)
    return G, Discriminator(cfg.discriminator)


def make_optimizers(cfg: Config):
    """G: plain Adam. D: lazy-reg-adjusted Adam (ref training_loop.py:190-205)."""
    g = cfg.training.g_optim
    tx = optax.adam(g.lr, b1=g.beta1, b2=g.beta2, eps=g.eps)
    if g.grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(g.grad_clip), tx)
    d = cfg.training.d_optim
    if cfg.loss.r1_gamma > 0:
        mb = cfg.loss.r1_interval / (cfg.loss.r1_interval + 1)
        d_tx = optax.adam(d.lr * mb, b1=d.beta1 ** mb, b2=d.beta2 ** mb, eps=d.eps)
    else:
        d_tx = optax.adam(d.lr, b1=d.beta1, b2=d.beta2, eps=d.eps)
    return tx, d_tx


def init_rngs(seed: int = 0) -> Dict[str, jax.Array]:
    keys = jax.random.split(jax.random.PRNGKey(seed), 5)
    return {'params': keys[0], 'noise': keys[1], 'render': keys[2],
            'depth': keys[3], 'dropout': keys[4]}


def create_train_state(cfg: Config, seed: int = 0,
                       local_batch: Optional[int] = None) -> Tuple[TrainState, Generator, Discriminator]:
    G, D = build_models(cfg)
    n = local_batch or max(cfg.discriminator.mbstd_group_size, 2)
    gc = cfg.generator
    z = jnp.zeros((n, gc.z_dim))
    c = jnp.zeros((n, gc.c_dim)) if gc.c_dim > 0 else None
    # 'custom' camera dist draws angles from the dataset at train time; any
    # valid angles do for shape-only init
    init_angles = (jnp.tile(jnp.array([[0.0, jnp.pi / 2, 0.0]]), (n, 1))
                   if cfg.camera.origin.angles.dist == 'custom' else None)
    cam = sample_camera_params(jax.random.PRNGKey(0), asdict(cfg.camera), n,
                               origin_angles=init_angles)

    if cfg.model_name == 'stylegan2':
        g_vars = G.init(init_rngs(seed), z, c, train=True)
    else:
        def init_fwd(g: Generator):
            # exercise every submodule so all params materialize (setup is lazy)
            ws = g.mapping(z, c, camera_angles=cam.angles, train=True)
            cam_post = (g.synthesis.apply_camera_adaptor(cam, z, c)
                        if gc.camera_adaptor.enabled else cam)
            return g.synthesis(ws, cam_post, train=True,
                               concat_depth=cfg.training.use_depth)

        g_vars = G.init(init_rngs(seed), method=init_fwd)
    d_res = cfg.discriminator.input_resolution
    d_img = jnp.zeros((n, d_res, d_res, cfg.discriminator.img_channels))
    pp = {'scales': jnp.ones((n, 2)), 'offsets': jnp.zeros((n, 2))}
    d_vars = D.init({'params': jax.random.PRNGKey(seed + 1)}, d_img, c,
                    patch_params=pp, camera_angles=cam.angles,
                    predict_feat=cfg.loss.kd.weight > 0, train=True)
    g_tx, d_tx = make_optimizers(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_vars['params'], g_consts=g_vars.get('consts', {}),
        g_ema_coll=g_vars.get('ema', {}),
        d_params=d_vars['params'],
        # real copies — aliased buffers break donation (double-donate)
        ema_params=jax.tree.map(jnp.copy, g_vars['params']),
        ema_ema_coll=jax.tree.map(jnp.copy, g_vars.get('ema', {})),
        g_opt=g_tx.init(g_vars['params']),
        d_opt=d_tx.init(d_vars['params']),
        pl_mean=jnp.zeros(()),
    )
    return state, G, D


def _microbatched_grad(loss_fn, params, data, n_micro: int):
    """Gradient accumulation over microbatches (ref `batch_gpu`,
    train.py:169 + training_loop.py:329-330).

    loss_fn(params, data_micro) -> (loss, aux) where every leaf of `data`
    has leading dim n = n_micro * micro. Returns ((loss, aux), grads)
    averaged over microbatches via a lax.scan (one compiled body at micro
    size — this is also what lets batch 16 @256^2 compile on one chip).

    Per-sample outputs: an aux entry under the key '_collect' (a pytree of
    arrays with leading dim = micro) is STACKED across microbatches and
    reshaped back to leading dim n instead of being averaged — used to hand
    Gmain's rendered fakes to the Dmain phase (dmain_reuse_fakes).
    """
    vg = jax.value_and_grad(loss_fn, has_aux=True)
    if n_micro <= 1:
        # '_collect' already has leading dim n — passes through unchanged
        return vg(params, data)

    def split(x):
        return x.reshape((n_micro, x.shape[0] // n_micro) + x.shape[1:])

    data_s = jax.tree.map(split, data)
    first = jax.tree.map(lambda x: x[0], data_s)
    shapes = jax.eval_shape(vg, params, first)

    def strip_collect(tree):
        (loss, aux), grads = tree
        if isinstance(aux, dict) and '_collect' in aux:
            aux = {k: v for k, v in aux.items() if k != '_collect'}
        return (loss, aux), grads

    init = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), strip_collect(shapes))

    def body(acc, micro):
        (loss, aux), grads = vg(params, micro)
        collected = aux.pop('_collect', None) if isinstance(aux, dict) else None
        return jax.tree.map(jnp.add, acc, ((loss, aux), grads)), collected

    acc, collected = jax.lax.scan(body, init, data_s)
    (loss, aux), grads = jax.tree.map(lambda x: x / n_micro, acc)
    if collected is not None:
        # [n_micro, micro, ...] -> [n, ...]
        aux = dict(aux)
        aux['_collect'] = jax.tree.map(
            lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]), collected)
    return (loss, aux), grads


def _sample_gen_inputs(key, batch_size: int, cfg: Config, sched: Schedules,
                       gen_c: Optional[jnp.ndarray] = None,
                       gen_angles: Optional[jnp.ndarray] = None,
                       gen_z: Optional[jnp.ndarray] = None,
                       gen_cam: Optional[TensorGroup] = None):
    """z, labels, prior cameras, GPC-spoofed conditioning angles
    (ref training_loop.py:301-316). gen_c / gen_angles are dataset-sampled
    conditioning (labels always; angles when camera dist == 'custom');
    gen_z / gen_cam are full batch-side overrides (the controlled-inputs
    test mode — tests/test_train_step.py multi-device equivalence)."""
    k_z, k_c, k_cam, k_spoof = jax.random.split(key, 4)
    z = gen_z if gen_z is not None else jax.random.normal(
        k_z, (batch_size, cfg.generator.z_dim))
    c = gen_c if gen_c is not None else sample_random_c(k_c, batch_size, cfg.generator.c_dim)
    cam = gen_cam if gen_cam is not None else sample_camera_params(
        k_cam, asdict(cfg.camera), batch_size, origin_angles=gen_angles)
    spoof = jax.random.uniform(k_spoof, (batch_size,)) < sched.gpc_spoof_p
    cond_angles = jnp.where(spoof[:, None], jnp.roll(cam.angles, 1, axis=0), cam.angles)
    return z, c, cam, cond_angles


def make_train_step(cfg: Config, G: Generator, D: Discriminator,
                    axis_name: Optional[str] = None,
                    controlled: bool = False):
    """Returns step(state, batch, rng, sched, do_r1) -> (state, stats).

    When axis_name is set, the function is meant to run inside
    shard_map(..., axis_names={axis_name}): grads/stats are pmean'd.

    controlled=True is the TEST-ONLY deterministic-inputs mode (SURVEY §4(d)
    pmean-grad equivalence): the per-shard RNG fold is skipped, per-sample
    fold indices come from batch['sample_idx'] (global, sharded along with
    the data), gen inputs may be passed via batch ('gen_z_g/d',
    'gen_cam_g/d'), real patch params via 'real_pp_scales/offsets', and the
    pmean'd raw gradients are returned in stats['_debug'] so a sharded step
    can be asserted numerically equal to a single-device full-batch step."""
    g_tx, d_tx = make_optimizers(cfg)
    do_kd = cfg.loss.kd.weight > 0
    adv = cfg.loss.adv_loss_type
    clamp = cfg.discriminator.logits_clamp_val
    is_2d = cfg.model_name == 'stylegan2'

    # Dmain fake render at bf16 bandwidth (training.dmain_fake_bf16): a
    # second Generator VIEW over the same params — all decoder blocks bf16
    # (num_fp16_res covers the whole stack) + bf16 render streams. Params
    # are runtime-cast by the layers, so the param tree is identical and
    # G.apply/G_fake.apply are interchangeable.
    G_fake = G
    if cfg.training.dmain_fake_bf16 and not is_2d:
        import dataclasses
        G_fake = Generator(dataclasses.replace(
            cfg.generator, render_bf16=True, fp32_only=False, num_fp16_res=16))
    # Gmain's differentiated render at bf16 stream bandwidth
    # (training.gmain_render_bf16): bf16 planes + gather/MLP streams in the
    # path gradients flow through; decoder block precision unchanged
    # (num_fp16_res), params stay fp32 masters. Round-4 candidate — needs a
    # dynamics A/B before default-on.
    G_main = G
    if cfg.training.gmain_render_bf16 and not is_2d:
        import dataclasses
        G_main = Generator(dataclasses.replace(cfg.generator, render_bf16=True))
    reuse_fakes = cfg.training.dmain_reuse_fakes and not is_2d
    if reuse_fakes and cfg.training.dmain_fake_bf16:
        # surface the precedence loudly: with reuse there IS no Dmain
        # render for the bf16 view to run, so the configured flag is inert
        # (reuse defaults ON since round 4 — a preset that sets
        # dmain_fake_bf16 must also set dmain_reuse_fakes=false)
        import warnings
        warnings.warn('training.dmain_fake_bf16 has no effect while '
                      'training.dmain_reuse_fakes is enabled (the default): '
                      'Dmain renders no fresh fakes. Set '
                      'training.dmain_reuse_fakes=false to use it.',
                      stacklevel=2)

    augment_pipe = None
    if cfg.training.augment.mode != 'noaug':
        from tdgp.training.augment import AugmentPipe
        augment_pipe = AugmentPipe(cfg.training.augment,
                                   num_color_channels=cfg.generator.img_channels)

    def pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name else x

    def scrub(grads):
        return jax.tree.map(nan_to_num, grads)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array,
             sched: Schedules, do_r1: bool):
        if axis_name and not controlled:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        # compact-transfer ingestion: the loader may ship raw u8 images /
        # u16 depth (4x fewer host->device bytes — the tunneled client
        # leaks its transfer staging per put, DESIGN.md r5) and the step
        # normalizes on device. Bit-identical to host normalization
        # (ref training_loop.py:296-300); float batches (tests, bench,
        # synthetic iterator) pass through untouched.
        batch = dict(batch)
        if jnp.issubdtype(batch['img'].dtype, jnp.integer):
            batch['img'] = batch['img'].astype(jnp.float32) / 127.5 - 1.0
        if 'depth' in batch and jnp.issubdtype(batch['depth'].dtype, jnp.integer):
            batch['depth'] = batch['depth'].astype(jnp.float32) / 65536 * 2.0 - 1.0
        n = batch['img'].shape[0]
        sample_idx = batch.get('sample_idx')
        if sample_idx is None:
            sample_idx = jnp.arange(n, dtype=jnp.int32)
        (k_gen_g, k_gen_d, k_gfwd, k_dfwd, k_reg, k_patch_real,
         k_aug, k_pl) = jax.random.split(rng, 8)
        stats: Dict[str, jnp.ndarray] = {}

        augment_fn = None
        if augment_pipe is not None:
            def augment_fn(img, aug_rng):  # noqa: E306
                return augment_pipe(img, sched.ada_p, aug_rng)

        # ------------------------------------------------------ Gmain phase
        bg = cfg.training.batch_gpu
        n_micro = (n // bg) if (bg and bg < n) else 1
        if n_micro > 1:
            assert n % bg == 0, f'local batch {n} not divisible by batch_gpu {bg}'
            # a microbatch that splits an mbstd group would fail later as an
            # opaque reshape inside D's minibatch-std layer
            assert bg % cfg.discriminator.mbstd_group_size == 0, \
                f'batch_gpu {bg} not divisible by mbstd_group_size ' \
                f'{cfg.discriminator.mbstd_group_size}'
        zg, cg, camg, condg = _sample_gen_inputs(
            k_gen_g, n, cfg, sched, batch.get('gen_c_g'),
            batch.get('gen_camera_angles_g'), batch.get('gen_z_g'),
            batch.get('gen_cam_g'))

        def g_adv_loss(g_params, md):
            g_vars = {'params': g_params, 'consts': state.g_consts, 'ema': state.g_ema_coll}
            kf = jax.random.fold_in(k_gfwd, md['idx'][0])
            ka = jax.random.fold_in(jax.random.fold_in(k_aug, 0), md['idx'][0])
            if is_2d:
                out, patch_params, _ = losses.g_forward_2d(
                    G, g_vars, md['z'], md['c'], sched, kf, cfg)
                cam_post = md['cam']
            else:
                out, patch_params, cam_post, _ = losses.g_forward(
                    G_main, g_vars, md['z'], md['c'], md['cam'], md['cond'],
                    sched, kf, cfg)
            logits, _ = losses.d_forward(
                D, {'params': state.d_params}, out.img, md['c'], sched, cfg,
                patch_params=patch_params, camera_angles=cam_post.angles,
                augment_fn=augment_fn, rng=ka)
            loss_gmain = jnp.mean(losses.adv_loss_g(logits, adv))
            aux = {'Loss/G/loss': loss_gmain,
                   'Loss/scores/fake': jnp.mean(logits),
                   'Loss/signs/fake': jnp.mean(jnp.sign(logits))}
            if reuse_fakes:
                col = {'img': jax.lax.stop_gradient(out.img)}
                if not is_2d:
                    col['angles'] = jax.lax.stop_gradient(cam_post.angles)
                if patch_params is not None:
                    col['scales'] = patch_params['scales']
                    col['offsets'] = patch_params['offsets']
                aux['_collect'] = col
            return loss_gmain, aux

        g_md = {'z': zg, 'c': cg, 'cam': camg, 'cond': condg,
                'idx': sample_idx}
        (g_loss, g_aux), g_grads = _microbatched_grad(
            g_adv_loss, state.g_params, g_md, n_micro)
        reused = g_aux.pop('_collect', None) if reuse_fakes else None

        # camera-adaptor regularizers once per step (they sample their own
        # batches internally — ref loss.py:143-232); grads are additive
        acfg = cfg.generator.camera_adaptor
        if cfg.training.learn_camera_dist and not is_2d:
            def g_reg_loss(g_params):
                g_vars = {'params': g_params, 'consts': state.g_consts,
                          'ema': state.g_ema_coll}
                k_emd, k_fm, k_lip = jax.random.split(k_reg, 3)
                total = jnp.zeros(())
                aux = {}
                if acfg.emd.enabled:
                    emd, emd_stats = losses.camera_emd_reg(G, g_vars, sched, k_emd, cfg)
                    total = total + emd
                    aux.update(emd_stats)
                if acfg.adjust.angles and acfg.force_mean_weight > 0:
                    fm, fm_stats = losses.camera_force_mean_reg(G, g_vars, k_fm, cfg)
                    total = total + fm
                    aux.update(fm_stats)
                if acfg.lipschitz_weights.enabled:
                    lip, lip_stats = losses.camera_lipschitz_reg(G, g_vars, k_lip, cfg)
                    total = total + lip
                    aux.update(lip_stats)
                return total, aux

            if acfg.emd.enabled or (acfg.adjust.angles and acfg.force_mean_weight > 0) \
                    or acfg.lipschitz_weights.enabled:
                (_, reg_aux), reg_grads = jax.value_and_grad(
                    g_reg_loss, has_aux=True)(state.g_params)
                g_grads = jax.tree.map(jnp.add, g_grads, reg_grads)
                g_aux = {**g_aux, **reg_aux}

        g_grads = scrub(pmean(g_grads))
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        stats.update(g_aux)

        # -------------------------------------------------- Greg_pl phase
        # path-length regularization every r1_interval steps (ref loss.py:238-253;
        # pl_weight is 0 in every shipped 3DGP config but the phase is supported)
        pl_mean = state.pl_mean
        if do_r1 and cfg.loss.pl_weight > 0:
            shrink = max(cfg.loss.pl_batch_shrink, 1)
            n_pl = max(n // shrink, 1)
            gain_pl = float(cfg.loss.r1_interval)
            zp, cp, camp, condp = (zg[:n_pl], cg[:n_pl], camg[:n_pl], condg[:n_pl])
            k_pl_fwd, k_pl_noise = jax.random.split(k_pl)

            def pl_loss_fn(params):
                g_vars = {'params': params, 'consts': state.g_consts,
                          'ema': state.g_ema_coll}
                rngs = {'noise': k_pl_fwd, 'render': k_pl_fwd, 'depth': k_pl_fwd,
                        'dropout': k_pl_fwd}
                if is_2d:
                    ws = G_main.apply(g_vars, method=lambda g: g.mapping(zp, cp, train=True))
                else:
                    ws = G_main.apply(g_vars, method=lambda g: g.mapping(
                        zp, cp, camera_angles=condp, train=True))
                cam_post = camp
                if cfg.training.learn_camera_dist and not is_2d:
                    cam_post = G_main.apply(g_vars, method=lambda g:
                                       g.synthesis.apply_camera_adaptor(camp, zp, cp))
                pp = None
                if cfg.generator.patch.enabled:
                    pp = sample_patch_params(k_pl_fwd, n_pl, cfg.generator.patch,
                                             min_scale=sched.patch_min_scale,
                                             beta=sched.patch_beta)

                def synth(w):
                    if is_2d:
                        img = G_main.apply(g_vars, method=lambda g: g.synthesis(
                            w, noise_mode='random'), rngs=rngs)
                        if pp is not None:
                            img = extract_patches(img, pp, cfg.generator.patch.resolution)
                        return img
                    out = G_main.apply(g_vars, method=lambda g: g.synthesis(
                        w, cam_post, pp, train=True,
                        nerf_noise_std=sched.nerf_noise_std,
                        depth_progress=sched.depth_progress), rngs=rngs)
                    return out

                img, vjp_fn = jax.vjp(synth, ws)
                h, w_ = img.shape[1], img.shape[2]
                pl_noise = jax.random.normal(k_pl_noise, img.shape) / jnp.sqrt(h * w_)
                (pl_grads,) = vjp_fn(pl_noise)
                pl_lengths = jnp.sqrt(jnp.mean(jnp.sum(pl_grads ** 2, axis=2), axis=1))
                new_mean = state.pl_mean + cfg.loss.pl_decay * (
                    jnp.mean(pl_lengths) - state.pl_mean)
                penalty = jnp.square(pl_lengths - jax.lax.stop_gradient(new_mean))
                loss = jnp.mean(penalty) * cfg.loss.pl_weight * gain_pl
                return loss, (new_mean, jnp.mean(penalty))

            (pl_loss, (pl_mean, pl_pen)), pl_grads_tree = jax.value_and_grad(
                pl_loss_fn, has_aux=True)(g_params)
            pl_grads_tree = scrub(pmean(pl_grads_tree))
            pl_updates, g_opt = g_tx.update(pl_grads_tree, g_opt, g_params)
            g_params = optax.apply_updates(g_params, pl_updates)
            pl_mean = pmean(pl_mean)
            stats['Loss/pl_penalty'] = pl_pen
            stats['Loss/G/reg'] = pl_loss

        # ------------------------------------------------------ Dmain phase
        zd, cd, camd, condd = _sample_gen_inputs(
            k_gen_d, n, cfg, sched, batch.get('gen_c_d'),
            batch.get('gen_camera_angles_d'), batch.get('gen_z_d'),
            batch.get('gen_cam_d'))
        k_dg, k_dreal, k_r1 = jax.random.split(k_dfwd, 3)
        # fakes come from the UPDATED G (sequential phases, like the
        # reference which steps G before D in its phase list). Generation
        # happens INSIDE the (microbatched) D loss: no grads flow through G
        # there, so no residuals are recorded and fake-gen memory is bounded
        # by the microbatch size.
        new_g_vars = {'params': g_params, 'consts': state.g_consts, 'ema': state.g_ema_coll}

        # w_avg EMA update (ref loss.py:260 update_emas=True) — mapping-only
        # pass over the full batch, independent of the fake microbatching
        def ema_fwd(g):
            if is_2d:
                return g.mapping(zd, cd, update_emas=True, train=True)
            return g.mapping(zd, cd, camera_angles=condd, update_emas=True,
                             train=True)

        _, ema_mut = G.apply(new_g_vars, method=ema_fwd, mutable=['ema'],
                             rngs={'dropout': k_dg})
        new_ema_coll = ema_mut['ema']

        real4 = losses.prepare_real_img(batch['img'], batch['depth'], sched, cfg)
        if cfg.generator.patch.enabled:
            if 'real_pp_scales' in batch:  # controlled-inputs test mode
                real_pp = {'scales': batch['real_pp_scales'],
                           'offsets': batch['real_pp_offsets']}
            else:
                real_pp = sample_patch_params(k_patch_real, n, cfg.generator.patch,
                                              min_scale=sched.patch_min_scale,
                                              beta=sched.patch_beta)
            real_patches = extract_patches(real4, real_pp, cfg.generator.patch.resolution)
        else:
            real_pp, real_patches = None, real4

        def d_loss_fn(d_params, md):
            d_vars = {'params': d_params}
            kf = jax.random.fold_in(k_dg, md['idx'][0])
            ka1 = jax.random.fold_in(jax.random.fold_in(k_aug, 1), md['idx'][0])
            ka2 = jax.random.fold_in(jax.random.fold_in(k_aug, 2), md['idx'][0])
            if 'fake_img' in md:  # dmain_reuse_fakes: Gmain's render, with
                fake_c = md['cg']  # the labels/angles/patch it was made with
                fake_img = md['fake_img'].astype(jnp.float32)
                fake_angles = md['fake_angles']
                fpp = ({'scales': md['fake_scales'], 'offsets': md['fake_offsets']}
                       if 'fake_scales' in md else None)
            elif is_2d:
                fake_out, fpp, _ = losses.g_forward_2d(
                    G, new_g_vars, md['zd'], md['cd'], sched, kf, cfg)
                fake_angles = md['cam'].angles
                fake_img = jax.lax.stop_gradient(fake_out.img)
                fake_c = md['cd']
            else:
                fake_out, fpp, cam_post, _ = losses.g_forward(
                    G_fake, new_g_vars, md['zd'], md['cd'], md['cam'], md['cond'],
                    sched, kf, cfg)
                fake_angles = jax.lax.stop_gradient(cam_post.angles)
                # fp32 before D so its input dtype matches the real branch
                fake_img = jax.lax.stop_gradient(fake_out.img).astype(jnp.float32)
                fake_c = md['cd']
            fake_logits, _ = losses.d_forward(
                D, d_vars, fake_img, fake_c, sched, cfg,
                patch_params=fpp, camera_angles=fake_angles,
                augment_fn=augment_fn, rng=ka1)
            real_logits, real_feats = losses.d_forward(
                D, d_vars, md['real'], md['c'], sched, cfg,
                patch_params=md.get('rpp'), camera_angles=md['angles'],
                predict_feat=do_kd,
                augment_fn=augment_fn, rng=ka2)
            loss_fake = jnp.mean(losses.adv_loss_d_fake(fake_logits, adv, clamp))
            loss_real = jnp.mean(losses.adv_loss_d_real(real_logits, adv, clamp))
            total = loss_fake + loss_real
            aux = {'Loss/D/loss': loss_fake + loss_real,
                   'Loss/scores/real': jnp.mean(real_logits),
                   'Loss/signs/real': jnp.mean(jnp.sign(real_logits))}
            if do_kd:
                dist = losses.kd_loss(real_feats, md['embs'], cfg.loss.kd.loss_type)
                dist = dist * losses.compute_sample_weights(md.get('rpp'))
                loss_kd = jnp.mean(dist) * sched.kd_weight
                total = total + loss_kd
                aux['Loss/kd/D_dist'] = jnp.mean(dist)
                aux['Loss/kd/D_loss'] = loss_kd
            return total, aux

        d_md = {'zd': zd, 'cd': cd, 'cam': camd, 'cond': condd,
                'real': real_patches, 'c': batch['c'],
                'angles': batch['camera_angles'], 'embs': batch['embs'],
                'idx': sample_idx}
        if real_pp is not None:
            d_md['rpp'] = real_pp
        if reused is not None:
            d_md['fake_img'] = reused['img']
            d_md['fake_angles'] = reused['angles']
            d_md['cg'] = cg
            if 'scales' in reused:
                d_md['fake_scales'] = reused['scales']
                d_md['fake_offsets'] = reused['offsets']
        (d_loss, d_aux), d_grads = _microbatched_grad(
            d_loss_fn, state.d_params, d_md, n_micro)
        d_grads = scrub(pmean(d_grads))
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        stats.update(d_aux)

        # ------------------------------------------------------ Dreg (R1)
        if do_r1 and cfg.loss.r1_gamma > 0:
            gain = float(cfg.loss.r1_interval)

            def r1_loss_fn(d_params, md):
                d_vars = {'params': d_params}
                ka = jax.random.fold_in(jax.random.fold_in(k_aug, 3), md['idx'][0])

                def logits_of_img(img):
                    logits, _ = losses.d_forward(
                        D, d_vars, img, md['c'], sched, cfg,
                        patch_params=md.get('rpp'), camera_angles=md['angles'],
                        augment_fn=augment_fn, rng=ka)
                    return jnp.sum(logits)

                # r1_remat: recompute the D forward in the double-backward
                # instead of keeping its activations live — the grad-of-grad
                # liveness is what OOMs b24/b32 (battery9); R1 runs every
                # r1_interval steps so the replay cost amortizes to ~0
                inner = (jax.checkpoint(logits_of_img) if cfg.loss.r1_remat
                         else logits_of_img)
                r1_grads = jax.grad(inner)(md['real'])
                penalty = jnp.sum(jnp.square(r1_grads), axis=(1, 2, 3))
                loss = jnp.mean(penalty) * (cfg.loss.r1_gamma / 2) * gain
                return loss, jnp.mean(penalty)

            r1_md = {'real': real_patches, 'c': batch['c'],
                     'angles': batch['camera_angles'],
                     'idx': sample_idx}
            if real_pp is not None:
                r1_md['rpp'] = real_pp
            # R1-only microbatch (loss.r1_batch_gpu): the grad-of-grad
            # peak sets the HBM ceiling and amortizes over r1_interval
            # steps, so it may run at a smaller micro than the main phases
            rbg = cfg.loss.r1_batch_gpu
            n_micro_r1 = n_micro
            if rbg:
                # an explicit r1_batch_gpu always wins over batch_gpu's
                # n_micro — rbg == n means "one full-batch R1 micro"
                assert rbg <= n and n % rbg == 0, \
                    f'local batch {n} not divisible by r1_batch_gpu {rbg}'
                assert rbg % cfg.discriminator.mbstd_group_size == 0, \
                    f'r1_batch_gpu {rbg} not divisible by mbstd_group_size ' \
                    f'{cfg.discriminator.mbstd_group_size}'
                n_micro_r1 = n // rbg
            (r1_loss, r1_pen), r1_grads = _microbatched_grad(
                r1_loss_fn, d_params, r1_md, n_micro_r1)
            r1_grads = scrub(pmean(r1_grads))
            r1_updates, d_opt = d_tx.update(r1_grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, r1_updates)
            stats['Loss/D/r1_penalty'] = r1_pen
            stats['Loss/D/reg'] = r1_loss

        # ------------------------------------------------------ G EMA
        beta = sched.ema_beta
        ema_params = jax.tree.map(lambda p, e: p + (e - p) * beta,
                                  g_params, state.ema_params)

        stats = {k: pmean(v) for k, v in stats.items()}
        if controlled:
            # raw (already pmean'd) gradients for the multi-device
            # numerical-equivalence test — never set in production
            stats['_debug'] = {'g_grads': g_grads, 'd_grads': d_grads}
            if do_r1 and cfg.loss.r1_gamma > 0:
                stats['_debug']['r1_grads'] = r1_grads
        new_state = state.replace(
            step=state.step + 1, g_params=g_params, g_ema_coll=new_ema_coll,
            d_params=d_params, ema_params=ema_params,
            ema_ema_coll=jax.tree.map(jnp.copy, new_ema_coll),
            g_opt=g_opt, d_opt=d_opt, pl_mean=pl_mean)
        return new_state, stats

    return step


def make_jitted_train_steps(cfg: Config, G: Generator, D: Discriminator,
                            mesh: Optional[jax.sharding.Mesh] = None,
                            donate: bool = False, controlled: bool = False):
    """Returns (step_no_r1, step_r1): jitted, optionally shard_map'ed over
    mesh axis 'data'. Batch arrays are sharded along axis 0; state and
    schedules are replicated.

    donate: donate the state argument on the single-device path (the mesh
    path always donates). Frees ~a params+EMA+optimizer copy of HBM during
    the step — callers must not reuse a state object after passing it
    (the training loop and bench reassign; tests that replay a state from
    the same input must leave this off)."""
    if mesh is None:
        base = make_train_step(cfg, G, D, axis_name=None, controlled=controlled)
        dn = (0,) if donate else ()
        return (jax.jit(functools.partial(base, do_r1=False), donate_argnums=dn),
                jax.jit(functools.partial(base, do_r1=True), donate_argnums=dn))

    from jax.sharding import PartitionSpec as P
    base = make_train_step(cfg, G, D, axis_name='data', controlled=controlled)

    def wrap(do_r1):
        def fn(state, batch, rng, sched):
            return base(state, batch, rng, sched, do_r1=do_r1)
        sharded = jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(), P('data'), P(), P()),
            out_specs=(P(), P()),
            check_vma=False)
        return jax.jit(sharded, donate_argnums=(0,))

    return wrap(False), wrap(True)
