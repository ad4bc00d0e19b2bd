"""The training loop: data, phases, ticks, snapshots, metrics, logging.

Counterpart of ref src/training/training_loop.py:39-607. The per-step work
is entirely inside the jitted train step (tdgp.training.train_step); this
module owns host-side concerns: batch prefetch, schedule computation, the
ADA controller, tick-cadence logging (stats.jsonl), snapshot save/resume and
best-checkpoint retention.
"""
from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tdgp import checkpoint as ckpt
from tdgp.config import Config
from tdgp.data.dataset import BatchLoader, ImageFolderDataset, normalize_batch
from tdgp.training.schedules import compute_schedules
from tdgp.training.telemetry import (TBWriter, camera_posterior_report,
                                     make_camera_posterior_fn, progress_scalars)
from tdgp.training.train_step import (TrainState, create_train_state,
                                      make_jitted_train_steps, g_variables)
from tdgp.utils.profiling import PhaseTimer, trace
from tdgp.utils.stats import JsonlLogger, StatsCollector


def _rss_gb() -> float:
    """Resident set size of this process in GB (0.0 if unreadable)."""
    try:
        with open('/proc/self/status') as f:
            for line in f:
                if line.startswith('VmRSS'):
                    return int(line.split()[1]) / 1e6
    except (OSError, ValueError, IndexError):
        pass
    return 0.0


def synthetic_batch_iterator(cfg: Config, batch_size: int, seed: int = 0):
    """Random data source for smoke tests / benchmarking without a dataset."""
    rng = np.random.RandomState(seed)
    res = cfg.dataset.resolution
    c_dim = cfg.dataset.c_dim
    while True:
        c = np.zeros((batch_size, c_dim), dtype=np.float32)
        if c_dim > 0:
            c[np.arange(batch_size), rng.randint(0, c_dim, batch_size)] = 1
        yield {
            'img': rng.uniform(-1, 1, (batch_size, res, res, 3)).astype(np.float32),
            'depth': rng.uniform(-1, 1, (batch_size, res, res, 1)).astype(np.float32),
            'c': c,
            'camera_angles': np.concatenate([
                rng.uniform(0.5, 1.5, (batch_size, 2)),
                np.zeros((batch_size, 1))], axis=1).astype(np.float32),
            'embs': rng.randn(batch_size, cfg.dataset.embedding_dim).astype(np.float32),
        }


def with_gen_conditioning(iterator, dataset, cfg: Config, seed: int = 0):
    """Attach dataset-sampled generator conditioning to each batch
    (ref training_loop.py:301-312): labels for gen phases always come from
    random dataset items; camera angles too when
    cfg.camera.origin.angles.dist == 'custom'."""
    rng = np.random.RandomState(seed + 0x9e3779)
    custom = cfg.camera.origin.angles.dist == 'custom'
    use_labels = cfg.dataset.c_dim > 0
    if not (custom or use_labels):
        yield from iterator
        return
    for batch in iterator:
        n = len(batch['img'])
        out = dict(batch)
        for suffix in ('g', 'd'):
            idx = rng.randint(len(dataset), size=n)
            if use_labels:
                out[f'gen_c_{suffix}'] = np.stack(
                    [dataset.get_label(i) for i in idx]).astype(np.float32)
            if custom:
                out[f'gen_camera_angles_{suffix}'] = np.stack(
                    [dataset.get_camera_angles(i) for i in idx]).astype(np.float32)
        yield out


def make_data_iterator(cfg: Config, batch_size: int, loader_threads: int = 2):
    """Build this PROCESS's training data iterator.

    In a multi-process run (jax.distributed) each process loads a DISJOINT
    rank-strided slice of the index stream (InfiniteSampler rank striding,
    ref misc.py:112-143 + training_loop.py:99-100) and yields its local
    batch_size // process_count share; gen-conditioning sampling is
    seed-offset per process so conditioning draws are disjoint too.
    Returns (iterator, loader-or-None)."""
    t = cfg.training
    nproc = jax.process_count()
    pid = jax.process_index()
    assert batch_size % nproc == 0, (batch_size, nproc)
    local_bs = batch_size // nproc
    if cfg.dataset.path:
        dataset = ImageFolderDataset(
            cfg.dataset.path, resolution=cfg.dataset.resolution,
            use_labels=cfg.dataset.c_dim > 0, use_depth=t.use_depth,
            use_embeddings=cfg.dataset.use_embeddings and cfg.loss.kd.weight > 0,
            mirror=cfg.dataset.mirror, max_size=cfg.dataset.max_size,
            embeddings_path=cfg.dataset.embeddings_path,
            embeddings_desc_path=cfg.dataset.embeddings_desc_path)
        loader = BatchLoader(dataset, local_bs, rank=pid, num_replicas=nproc,
                             seed=t.seed, num_threads=loader_threads)
        return with_gen_conditioning(
            (normalize_batch(b, compact=t.compact_transfer) for b in loader),
            dataset, cfg, seed=t.seed + pid), loader
    return synthetic_batch_iterator(cfg, local_bs, seed=t.seed + pid), None


def training_loop(
    cfg: Config,
    run_dir: str,
    *,
    mesh: Optional[jax.sharding.Mesh] = None,
    batch_iterator=None,                       # yields normalized numpy batches
    metric_fn: Optional[Callable] = None,      # (state, G, cur_nimg) -> {name: value}
    vis_fn: Optional[Callable] = None,         # (state, G, cur_nimg) -> None
    max_kimg: Optional[float] = None,
    verbose: bool = True,
) -> TrainState:
    os.makedirs(run_dir, exist_ok=True)
    t = cfg.training
    batch_size = t.batch_size
    num_shards = 1 if mesh is None else mesh.devices.size
    assert batch_size % num_shards == 0
    total_kimg = max_kimg if max_kimg is not None else t.total_kimg
    # host-side IO (stats.jsonl, tensorboard, prints, best-ckpt deletes) is
    # the main process's job in a multi-process run — every process shares
    # run_dir (ref training_loop.py gates the same things on rank 0).
    # Device-side collectives (the step, snapshot save, metric feature
    # gather) stay ALL-process: they are SPMD programs over global arrays.
    is_main = jax.process_index() == 0
    verbose = verbose and is_main

    # ---------------------------------------------------------------- data
    if batch_iterator is None:
        batch_iterator, _loader = make_data_iterator(cfg, batch_size)
    nproc = jax.process_count()
    to_global = None
    if mesh is not None and nproc > 1:
        # multi-process: each process contributes its local share; assemble
        # the global sharded batch (the TPU analogue of per-rank DataLoaders
        # feeding one logical step, ref training_loop.py:99-100,329)
        from jax.experimental import multihost_utils
        from jax.sharding import PartitionSpec as P

        def to_global(b):  # noqa: E731
            return multihost_utils.host_local_array_to_global_array(
                b, mesh, P('data'))

    # ---------------------------------------------------------------- state
    state, G, D = create_train_state(cfg, seed=t.seed,
                                     local_batch=batch_size // num_shards)
    cur_nimg = 0
    resume_meta: dict = {}
    resume_path = ckpt.resolve_resume(run_dir, t.resume)
    if resume_path:
        state, resume_meta = ckpt.load_snapshot(resume_path, state)
        cur_nimg = int(resume_meta.get('cur_nimg', 0))
        if verbose:
            print(f'Resumed from {resume_path} at {cur_nimg / 1e3:.1f} kimg')

    # donate: the loop reassigns state on every step and only ever reads the
    # newest state afterwards (telemetry/snapshots), so donation is safe and
    # frees a params+EMA+optimizer copy of HBM on the single-chip path
    step_plain, step_r1 = make_jitted_train_steps(cfg, G, D, mesh=mesh,
                                                  donate=True)

    # ---------------------------------------------------------------- loop
    collector = StatsCollector()
    jsonl = JsonlLogger(os.path.join(run_dir, 'stats.jsonl')) if is_main else None
    tb = TBWriter(os.path.join(run_dir, 'tensorboard'),
                  enabled=t.tensorboard and is_main)
    timer = PhaseTimer()
    posterior_fn = make_camera_posterior_fn(G, cfg)
    profile_ctx = trace(os.path.join(run_dir, 'profiling_logs'),
                        enabled=t.run_profiling)
    profile_ctx.__enter__()  # closed after tick 2 (wait/warmup/active ~ ref)
    rng = jax.random.PRNGKey(t.seed)
    batch_idx = int(resume_meta.get('batch_idx', 0))
    cur_tick = 0
    tick_start_nimg = cur_nimg
    tick_start_time = time.time()
    start_time = tick_start_time
    ada_p = 0.0 if t.augment.mode != 'fixed' else t.augment.p
    # the ADA controller state and phase-scheduling offset ride the snapshot
    # meta (ref training_loop.py:217-223 resume_whole_state semantics)
    ada_p = float(resume_meta.get('ada_p', ada_p))
    ada_signs_acc: list = []
    best_metric = None
    best_snapshot_path = None
    main_metric = t.metrics[0] if t.metrics else None
    # re-armable metric-eval containment (round-4 one-way disable was a
    # silent loss of the whole in-loop FID curve on a 25k-kimg campaign):
    # a failure skips exponentially more val ticks per consecutive failure
    # (1, 2, 4, ... capped at 8) and any success re-arms fully
    metric_fail_streak = 0
    metric_retry_tick = 0

    # stats stay on device between ticks: pulling every scalar every step
    # forces a host round-trip per step (round-1 review weak spot #3); the
    # buffer is drained at tick boundaries (and ADA intervals for the sign
    # stat the controller consumes).
    stats_buf: list = []

    def drain_stats():
        from tdgp.training.telemetry import host_np
        for s in stats_buf:
            # host_np: step stats are replicated outputs of the shard_map
            # step — multi-host np.asarray would see non-addressable shards
            collector.report_dict({k: float(host_np(v)) for k, v in s.items()})
        stats_buf.clear()

    local_angles = None
    while True:
        with timer.phase('data'):
            batch = next(batch_iterator)
            batch.pop('_indices', None)  # loader observability, not step input
            # host-local copy for tick telemetry: after to_global these are
            # globally-sharded jax.Arrays whose np.asarray would crash on
            # non-addressable shards
            local_angles = batch.get('gen_camera_angles_g',
                                     batch.get('camera_angles'))
            if to_global is not None:
                batch = to_global(batch)
        sched = compute_schedules(cfg, cur_nimg, ada_p=ada_p)
        do_r1 = (cfg.loss.r1_gamma > 0) and (batch_idx % cfg.loss.r1_interval == 0)
        step_fn = step_r1 if do_r1 else step_plain
        rng, step_rng = jax.random.split(rng)
        with timer.phase('step_dispatch'):
            state, stats = step_fn(state, batch, step_rng, sched)
        stats_buf.append(stats)
        if 'Loss/signs/real' in stats:
            ada_signs_acc.append(stats['Loss/signs/real'])

        cur_nimg += batch_size
        batch_idx += 1

        # ADA controller (ref training_loop.py:372-376); p clamped to [0, 1]
        # (augment probability — the reference implicitly bounds it)
        if t.augment.mode == 'ada' and batch_idx % t.augment.ada_interval == 0 and ada_signs_acc:
            from tdgp.training.telemetry import host_np
            # this pull blocks on the device queue every ada_interval
            # steps, so under async dispatch it absorbs most of the
            # device's step time — timing it makes sec_per_tick add up
            # (Timing/ada_sync ~= device-bound wall; see DESIGN.md r5)
            with timer.phase('ada_sync'):
                signs = float(np.mean([host_np(s) for s in ada_signs_acc]))
            adjust = np.sign(signs - t.augment.target) * \
                (batch_size * t.augment.ada_interval) / (t.augment.ada_kimg * 1000)
            ada_p = min(max(ada_p + adjust, 0.0), 1.0)
            ada_signs_acc = []

        done = cur_nimg >= total_kimg * 1000
        if not done and cur_nimg < tick_start_nimg + t.tick_kimg * 1000:
            continue

        # ------------------------------------------------------------ tick
        cur_tick += 1
        with timer.phase('stats_sync', sync_on=stats_buf[-1] if stats_buf else None):
            drain_stats()
        now = time.time()
        sec_per_tick = now - tick_start_time
        sec_per_kimg = sec_per_tick / max((cur_nimg - tick_start_nimg) / 1e3, 1e-8)
        collector.report('Timing/sec_per_tick', sec_per_tick)
        collector.report('Timing/sec_per_kimg', sec_per_kimg)
        collector.report_dict(timer.means())
        timer.reset()
        collector.report_dict(progress_scalars(sched, ada_p))
        rng, k_post = jax.random.split(rng)
        collector.report_dict(camera_posterior_report(
            posterior_fn, g_variables(state), k_post, tb=tb, step=cur_nimg,
            origin_angles=local_angles))
        if cur_tick == 2 and t.run_profiling:
            profile_ctx.__exit__(None, None, None)
        if verbose:
            print(f"tick {cur_tick:<5d} kimg {cur_nimg / 1e3:<8.1f} "
                  f"time {now - start_time:<10.1f} sec/kimg {sec_per_kimg:<7.2f} "
                  f"G_loss {collector.mean('Loss/G/loss'):<6.3f} "
                  f"D_loss {collector.mean('Loss/D/loss'):<6.3f}")

        if vis_fn is not None and cur_tick % t.image_snap == 0:
            vis_fn(state, G, cur_nimg)

        # snapshot BEFORE metric eval (matching the reference, which saves
        # the pickle and then evaluates it, training_loop.py:461-471): the
        # eval is the compile-heavy step most likely to die on a flaky
        # compile service, and a crash there must not lose the tick's
        # weights (round-4 flagship leg1 lost 10 kimg to exactly that)
        path = None
        if cur_tick % t.snap == 0 or done:
            # replica-divergence check every snapshot tick (ref
            # training_loop.py:448-456 check_ddp_consistency)
            if mesh is not None and mesh.devices.size > 1:
                from tdgp.parallel.consistency import check_replica_consistency
                bad = (check_replica_consistency(state.g_params, name_prefix='G.')
                       + check_replica_consistency(state.d_params, name_prefix='D.'))
                collector.report('Consistency/num_mismatched', float(len(bad)))
                if bad and verbose:
                    print(f'WARNING: replica mismatch in {bad[:5]}')
            path = ckpt.save_snapshot(run_dir, state, cur_nimg=cur_nimg,
                                      meta={'batch_idx': batch_idx, 'ada_p': ada_p})

        metric_results: Dict[str, float] = {}
        if (metric_fn is not None and t.metrics and cur_tick >= metric_retry_tick
                and (cur_tick % t.val_freq == 0 or done)):
            # failure containment (SURVEY §5.3): the in-loop eval is a big
            # fresh compile — on flaky compile services it can die while
            # the training programs themselves are healthy (the round-4
            # flagship lost two legs to exactly this). A failed eval warns,
            # records the event in stats.jsonl, and backs off exponentially
            # (next retry after 2^streak val ticks, capped at 8); a success
            # re-arms fully. FID is always also available offline from the
            # (already-saved) snapshots via scripts/calc_metrics.py.
            try:
                metric_results = metric_fn(state, G, cur_nimg)
                for name, value in metric_results.items():
                    collector.report(f'Metrics/{name}', value)
                metric_fail_streak = 0
            except Exception as e:  # noqa: BLE001 — contain, don't die
                metric_fail_streak += 1
                skip = min(2 ** metric_fail_streak, 8)
                metric_retry_tick = cur_tick + skip * t.val_freq
                collector.report('Metrics/eval_failed', 1.0)
                if verbose:
                    print(f'WARNING: in-loop metric eval failed ({type(e).__name__}: '
                          f'{str(e)[:200]}); streak {metric_fail_streak}, retrying '
                          f'at tick {metric_retry_tick} — offline fallback: '
                          f'scripts/calc_metrics.py')

        if path is not None:
            # best-checkpoint retention (ref training_loop.py:473-497)
            if main_metric and main_metric in metric_results:
                value = metric_results[main_metric]
                if best_metric is None or value < best_metric:
                    if best_snapshot_path and best_snapshot_path != path:
                        prev_kimg = ckpt.snapshot_kimg(best_snapshot_path)
                        if prev_kimg % (t.snap * t.tick_kimg) != 0:
                            if is_main:
                                ckpt.delete_snapshot(best_snapshot_path)
                    best_metric, best_snapshot_path = value, path

        tick_stats = collector.as_dict()
        if jsonl is not None:
            jsonl.write(tick_stats)
        tb.scalars({k: v['mean'] if isinstance(v, dict) else v
                    for k, v in tick_stats.items()}, cur_nimg)
        tb.flush()
        collector.reset()
        tick_start_nimg = cur_nimg
        tick_start_time = time.time()
        if done:
            break
        # host-RSS watchdog (SURVEY §5.3 failure detection): the tunneled
        # device client leaks host RAM per step (r5 flagship leg 2 reached
        # 111 GB RSS in 4 h and thrashed the host into a stall). Long
        # campaigns survive by the same mechanism as preemption: snapshot,
        # exit cleanly, let the restart chain resume from --run-dir.
        if t.max_rss_gb and _rss_gb() > t.max_rss_gb:
            if path is None:
                path = ckpt.save_snapshot(
                    run_dir, state, cur_nimg=cur_nimg,
                    meta={'batch_idx': batch_idx, 'ada_p': ada_p})
            if verbose:
                print(f'RSS {_rss_gb():.1f} GB > training.max_rss_gb='
                      f'{t.max_rss_gb}: snapshot saved at {cur_nimg // 1000} '
                      f'kimg; exiting for a clean restart (resume with '
                      f'--run-dir)', flush=True)
            break

    if t.run_profiling and cur_tick < 2:
        profile_ctx.__exit__(None, None, None)
    if jsonl is not None:
        jsonl.close()
    tb.close()
    return state
