"""Benchmark: full 3DGP G+D train-step throughput, imgs/sec/chip at 256².

Measures the real training cadence — 15 plain steps + 1 R1 step per 16
(lazy regularization, ref training/base.yaml r1 every 16) — on the
satellite-dataset configuration (cbase 32768 / cmax 512, tri-plane
512²x32x3, 64² patches, 32x2 ray steps; ref README.md:61, model/3dgp.yaml).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.md). We pin an assumed A100 reference of 20 imgs/sec/GPU for this
G+D step (StyleGAN2-scale G at 512² + 64²-patch two-pass NeRF + R1/16 —
consistent with SG2 A100 tooling numbers); the driver target is >=4x that.
"""
import json
import time

import numpy as np

import jax

# rbg PRNG: ~10x faster key expansion on TPU than threefry (stratified
# jitter, density noise, patch/camera sampling are per-step RNG consumers)
jax.config.update('jax_default_prng_impl', 'rbg')

# persistent compile cache: the satellite train step costs minutes of
# XLA+Mosaic compile per variant; cache hits make bench reruns (and the
# cost-analysis recompile below) near-free. Machine-keyed subdir: stale
# blobs from a different VM skew numerics (see utils/platform.py).
import os as _os  # noqa: E402

from tdgp.utils.platform import compilation_cache_dir as _ccd  # noqa: E402
jax.config.update('jax_compilation_cache_dir',
                  _ccd(_os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                     '.jax_cache')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

import jax.numpy as jnp  # noqa: E402

ASSUMED_A100_IMGS_PER_SEC = 20.0

# bf16 MXU peak per chip, by device-kind substring (public spec sheets);
# MFU is reported against the bf16 peak — the "speed of light" of the part
_PEAK_BF16_FLOPS = (
    ('v5 lite', 197e12),   # v5e
    ('v5e', 197e12),
    ('v5p', 459e12),
    ('v6e', 918e12),       # Trillium
    ('v4', 275e12),
)


def device_peak_flops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for sub, peak in _PEAK_BF16_FLOPS:
        if sub in kind:
            return peak
    return 0.0


def make_batch(key, n, res, c_dim, emb_dim):
    ks = jax.random.split(key, 4)
    return {
        'img': jax.random.uniform(ks[0], (n, res, res, 3), minval=-1, maxval=1),
        'depth': jax.random.uniform(ks[1], (n, res, res, 1), minval=-1, maxval=1),
        'c': jax.nn.one_hot(jnp.arange(n) % max(c_dim, 1), c_dim),
        'camera_angles': jnp.concatenate([
            jax.random.uniform(ks[2], (n, 2), minval=0.5, maxval=1.5),
            jnp.zeros((n, 1))], axis=1),
        'embs': jax.random.normal(ks[3], (n, emb_dim)),
    }


def run_bench(batch_size: int, batch_gpu=None):
    from tdgp.config import satellite_config, replace
    from tdgp.training.schedules import compute_schedules
    from tdgp.training.train_step import create_train_state, make_jitted_train_steps

    import dataclasses
    import os
    cfg = satellite_config(c_dim=0, resolution=256)
    if batch_gpu:
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training, batch_gpu=batch_gpu))
    pack = os.environ.get('TDGP_PLANE_PACK')  # experimentation knob
    if pack:
        cfg = dataclasses.replace(
            cfg, generator=dataclasses.replace(cfg.generator, plane_pack=pack))
    save = os.environ.get('TDGP_SAMPLE_SAVE')  # experimentation knob
    if save:
        cfg = dataclasses.replace(
            cfg, generator=dataclasses.replace(cfg.generator, sample_save=save))
    if os.environ.get('TDGP_G_FP32'):  # fp32-only decoder control run
        cfg = dataclasses.replace(
            cfg, generator=dataclasses.replace(cfg.generator, fp32_only=True))
    if os.environ.get('TDGP_DMAIN_BF16'):  # bf16 Dmain fake render
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training, dmain_fake_bf16=True))
    if os.environ.get('TDGP_NO_DECODER_REMAT'):  # save decoder activations
        cfg = dataclasses.replace(
            cfg, generator=dataclasses.replace(cfg.generator, decoder_remat=False))
    if os.environ.get('TDGP_REUSE_FAKES'):  # Dmain reuses Gmain's fakes
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training, dmain_reuse_fakes=True))
    if os.environ.get('TDGP_NO_REUSE_FAKES'):  # control: fresh Dmain render
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training, dmain_reuse_fakes=False))
    if os.environ.get('TDGP_GMAIN_BF16'):  # bf16 differentiated Gmain render
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training, gmain_render_bf16=True))
    if os.environ.get('TDGP_R1_REMAT'):  # remat R1's inner D forward
        cfg = dataclasses.replace(
            cfg, loss=dataclasses.replace(cfg.loss, r1_remat=True))
    if os.environ.get('TDGP_R1_BATCH_GPU'):  # R1-only microbatch size
        cfg = dataclasses.replace(
            cfg, loss=dataclasses.replace(
                cfg.loss, r1_batch_gpu=int(os.environ['TDGP_R1_BATCH_GPU'])))
    merged = os.environ.get('TDGP_MERGED_SPLAT')  # merged bwd splat ('0' = off)
    if merged:
        cfg = dataclasses.replace(
            cfg, generator=dataclasses.replace(cfg.generator,
                                               merged_splat=merged != '0'))
    state, G, D = create_train_state(cfg, seed=0, local_batch=batch_size)
    # donate: each state object is passed to exactly one step call below
    # (always reassigned); frees a params+EMA+opt copy of HBM during the step
    step_plain, step_r1 = make_jitted_train_steps(cfg, G, D, donate=True)

    res = cfg.dataset.resolution
    batch = make_batch(jax.random.PRNGKey(0), batch_size, res,
                       cfg.dataset.c_dim, cfg.dataset.embedding_dim)
    sched = compute_schedules(cfg, cur_nimg=500_000)  # mid-training schedule values
    rng = jax.random.PRNGKey(1)

    # warmup / compile
    state, st = step_plain(state, batch, rng, sched)
    _ = float(st['Loss/G/loss'])
    state, st = step_r1(state, batch, rng, sched)
    _ = float(st['Loss/G/loss'])

    # per-step host sync: pulling a scalar stat guarantees the step really
    # executed (block_until_ready alone proved unreliable on tunneled rigs)
    n_plain, n_r1 = 7, 1
    t0 = time.perf_counter()
    for i in range(n_plain):
        state, st = step_plain(state, batch, jax.random.fold_in(rng, i), sched)
        _ = float(st['Loss/G/loss'])
    for i in range(n_r1):
        state, st = step_r1(state, batch, jax.random.fold_in(rng, 100 + i), sched)
        _ = float(st['Loss/G/loss'])
    elapsed = time.perf_counter() - t0

    # reconstruct the real 15:1 training cadence from the measured mix
    t_step = elapsed / (n_plain + n_r1)  # r1 steps dominate barely; keep simple
    imgs = batch_size * (n_plain + n_r1)

    # rays/sec + MFU (BASELINE.md row 3 "render rays/sec — tracked"):
    # the step renders the patch twice (Gmain fake + Dmain fake), each ray
    # integrated over coarse+fine samples — once only under dmain_reuse_fakes
    patch_res = cfg.generator.patch.resolution
    n_samples = cfg.generator.num_ray_steps * 2
    renders_per_step = 1 if cfg.training.dmain_reuse_fakes else 2
    rays_per_step = batch_size * patch_res * patch_res * renders_per_step
    rays_per_sec = rays_per_step / t_step
    samples_per_sec = rays_per_sec * n_samples

    # MFU from XLA's own cost analysis of the compiled steps (15:1 cadence
    # mix); the persistent compile cache makes the extra lower+compile cheap
    mfu = None
    flops_per_step = None
    try:
        # AOT recompile hits the persistent compile cache (warmed by the
        # jitted calls above), so this costs seconds, not minutes
        fl_plain = step_plain.lower(state, batch, rng, sched) \
            .compile().cost_analysis()['flops']
        fl_r1 = step_r1.lower(state, batch, rng, sched) \
            .compile().cost_analysis()['flops']
        flops_per_step = (15 * fl_plain + fl_r1) / 16
        peak = device_peak_flops()
        if peak > 0:
            mfu = flops_per_step / t_step / peak
    except Exception:
        pass

    return imgs / elapsed, elapsed, {
        'rays_per_sec': round(rays_per_sec),
        'samples_per_sec': round(samples_per_sec),
        'flops_per_step': flops_per_step,
        'mfu': round(mfu, 5) if mfu is not None else None,
    }


def main():
    import os
    import subprocess
    import sys

    if '--single' in sys.argv:
        i = sys.argv.index('--single')
        bs = int(sys.argv[i + 1])
        bg = sys.argv[i + 2]
        bg = None if bg == 'none' else int(bg)
        imgs_per_sec, _, extra = run_bench(bs, bg)
        print(json.dumps({'imgs_per_sec': imgs_per_sec,
                          'batch': bs, 'batch_gpu': bg, **extra}))
        return

    # ladder: larger per-chip batches ride batch_gpu microbatching (lax.scan
    # grad accumulation); plain batches as fallback. Each attempt runs in its
    # own process: a failed/OOMed attempt fragments HBM and poisons later
    # attempts in the same process.
    # measured rungs (v5e 16GB, round-3 defaults: quad_bf16 + save_bf16 +
    # bf16 decoder + hoisted plane-VJP): batch 16 plain = 7.17 imgs/s,
    # batch 8 = 6.72. Under the round-2 fp32 'pair' code (16,*)/(32,8) all
    # OOMed; the bf16 tables/decoder freed the difference. Keep the 16GB
    # ladder short — a failed rung costs ~25 min of Mosaic/XLA compile
    # before it OOMs. Chips with more HBM (v5p/v6e) get bigger rungs.
    try:
        hbm = jax.devices()[0].memory_stats().get('bytes_limit', 0)
    except Exception:
        hbm = 0
    if hbm > 24 * 1024 ** 3:
        ladder = ((64, None), (32, None), (16, None), (8, None), (4, None))
    else:
        ladder = ((16, None), (8, None), (4, None))
    result = None
    for batch_size, batch_gpu in ladder:
        cmd = [sys.executable, os.path.abspath(__file__), '--single',
               str(batch_size), 'none' if batch_gpu is None else str(batch_gpu)]
        try:
            r = subprocess.run(cmd, capture_output=True, text=True, timeout=2400)
        except subprocess.TimeoutExpired:
            print(f'# batch {batch_size} (batch_gpu={batch_gpu}) timed out; '
                  f'retrying smaller', flush=True)
            continue
        if r.returncode == 0:
            for line in reversed(r.stdout.strip().splitlines()):
                try:
                    result = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
            if result is not None:
                break
        tail = (r.stderr or r.stdout).strip().splitlines()[-1:]
        print(f'# batch {batch_size} (batch_gpu={batch_gpu}) failed '
              f'({" ".join(tail)[:140]}...); retrying smaller', flush=True)
    if result is None:
        raise RuntimeError('all batch sizes OOMed')
    imgs_per_sec = result['imgs_per_sec']
    batch_size = result['batch']
    batch_gpu = result['batch_gpu']

    print(json.dumps({
        'metric': 'G+D train step throughput @256^2 (satellite cfg, r1/16 cadence)',
        'value': round(imgs_per_sec, 3),
        'unit': 'imgs/sec/chip',
        'vs_baseline': round(imgs_per_sec / ASSUMED_A100_IMGS_PER_SEC, 3),
        'batch_per_chip': batch_size,
        'batch_gpu': batch_gpu,
        'rays_per_sec': result.get('rays_per_sec'),
        'samples_per_sec': result.get('samples_per_sec'),
        'flops_per_step': result.get('flops_per_step'),
        'mfu': result.get('mfu'),
        'baseline_note': f'assumed A100 ref {ASSUMED_A100_IMGS_PER_SEC} imgs/s/GPU (repo publishes none)',
        'device': str(jax.devices()[0]),
    }))


if __name__ == '__main__':
    main()
