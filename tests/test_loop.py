"""Smoke test the full training loop: a few ticks on synthetic data with
snapshot save + resume (SURVEY.md §4 item (c) + §5.4)."""
import glob
import json
import os

import numpy as np
import pytest

from tdgp.config import tiny_test_config, replace
from tdgp.config import TrainingConfig
import dataclasses

from tdgp.training.loop import training_loop
from tdgp import checkpoint as ckpt

pytestmark = pytest.mark.slow  # heavy tier: excluded by -m "not slow"


def loop_cfg():
    cfg = tiny_test_config()
    training = dataclasses.replace(
        cfg.training, batch_size=4, tick_kimg=0.004, snap=2, image_snap=1000,
        total_kimg=1)
    return dataclasses.replace(cfg, training=training)


def test_training_loop_runs_and_checkpoints(tmp_path):
    cfg = loop_cfg()
    run_dir = str(tmp_path / 'run')
    # 3 ticks of 1 batch each (tick_kimg=0.004 == batch_size)
    state = training_loop(cfg, run_dir, max_kimg=0.012, verbose=False)
    assert int(np.asarray(state.step)) == 3

    # stats.jsonl written with expected keys
    with open(os.path.join(run_dir, 'stats.jsonl')) as f:
        lines = [json.loads(l) for l in f]
    assert len(lines) == 3
    assert 'Loss/G/loss' in lines[0] and 'Loss/D/loss' in lines[0]
    assert np.isfinite(lines[0]['Loss/G/loss']['mean'])

    # snapshot saved at tick 2 (snap=2)
    snaps = ckpt.list_snapshots(run_dir)
    assert len(snaps) >= 1

    # resume continues from the snapshot
    state2 = training_loop(cfg, run_dir, max_kimg=0.016, verbose=False)
    assert int(np.asarray(state2.step)) >= 1


def test_rss_watchdog_snapshots_and_exits(tmp_path):
    """training.max_rss_gb (SURVEY §5.3): when host RSS crosses the
    threshold the loop must save a snapshot and exit cleanly after the
    tick instead of letting the host thrash (r5 flagship leg 2 leaked to
    111 GB and stalled). An absurdly low threshold trips on tick 1."""
    cfg = loop_cfg()
    cfg = dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, max_rss_gb=0.001))
    run_dir = str(tmp_path / 'run')
    state = training_loop(cfg, run_dir, max_kimg=1.0, verbose=False)
    # exited after ONE tick, far short of max_kimg
    assert int(np.asarray(state.step)) == 1
    # and a snapshot exists to resume from
    assert len(ckpt.list_snapshots(run_dir)) >= 1


def test_metric_failure_containment_rearms(tmp_path):
    """A failed in-loop eval must not silence metrics for the rest of the
    run (the round-4 one-way disable): the loop backs off 2^streak val
    ticks, records the event in stats.jsonl, and a later success re-arms.
    Counterpart of the reference's in-loop eval (training_loop.py:461-471),
    hardened for flaky compile services."""
    cfg = loop_cfg()
    cfg = dataclasses.replace(cfg, training=dataclasses.replace(
        cfg.training, val_freq=1, metrics=('probe',)))
    run_dir = str(tmp_path / 'run')
    calls = []

    def metric_fn(state, G, cur_nimg):
        calls.append(cur_nimg)
        if len(calls) == 1:
            raise RuntimeError('simulated eval compile crash')
        return {'probe': 1.0 / len(calls)}

    # 5 ticks: fail@tick1 -> skip tick2 (backoff 2^1) -> succeed@tick3+
    training_loop(cfg, run_dir, max_kimg=0.020, verbose=False,
                  metric_fn=metric_fn)
    lines = [json.loads(l) for l in open(os.path.join(run_dir, 'stats.jsonl'))]

    def get(line, key):
        v = line.get(key)
        return v['mean'] if isinstance(v, dict) else v

    # the failure event landed in stats.jsonl (not just stdout)
    assert get(lines[0], 'Metrics/eval_failed') == 1.0
    # the eval resumed: a real metric value appears at a later tick
    assert any(get(l, 'Metrics/probe') is not None for l in lines[1:])
    # the backoff actually skipped exactly one val tick (5 ticks, 1 skipped)
    assert len(calls) == 4


def test_resume_restores_ada_p_and_batch_idx(tmp_path):
    """The ADA controller state and phase offset ride the snapshot meta —
    a resumed run must not reset p to 0 (ref training_loop.py:217-223)."""
    import dataclasses
    cfg = loop_cfg()
    cfg = dataclasses.replace(cfg, training=dataclasses.replace(
        cfg.training,
        augment=dataclasses.replace(cfg.training.augment, mode='fixed', p=0.37)))
    run_dir = str(tmp_path / 'run')
    training_loop(cfg, run_dir, max_kimg=0.012, verbose=False)
    snaps = ckpt.list_snapshots(run_dir)
    assert snaps
    meta = json.load(open(snaps[-1][1] + '.meta.json'))
    assert meta['ada_p'] == 0.37
    assert meta['batch_idx'] > 0
    # resume in 'ada' mode (controller active): p must start from the saved
    # value, not 0 — visible through Progress/augment_p of the first tick
    cfg2 = dataclasses.replace(cfg, training=dataclasses.replace(
        cfg.training,
        augment=dataclasses.replace(cfg.training.augment, mode='ada', p=0.0)))
    training_loop(cfg2, run_dir, max_kimg=0.016, verbose=False)
    lines = [json.loads(l) for l in open(os.path.join(run_dir, 'stats.jsonl'))]
    v = lines[-1]['Progress/augment_p']
    v = v['mean'] if isinstance(v, dict) else v
    assert abs(v - 0.37) < 0.05
