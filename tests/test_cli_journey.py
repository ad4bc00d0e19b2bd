"""End-to-end user journey through the CLI surface on the tiny preset:
train a few ticks -> resume -> render a grid -> extract geometry.
This is the integration test the reference approximated with dry-run modes
(SURVEY.md §4.5)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: excluded by -m "not slow"

REPO = os.path.join(os.path.dirname(__file__), '..')


def run(args, timeout=900):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = env.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=1'
    env['PYTHONPATH'] = REPO
    out = subprocess.run([sys.executable] + args, capture_output=True, text=True,
                         timeout=timeout, env=env, cwd=REPO)
    assert out.returncode == 0, f"{args}\nSTDOUT:{out.stdout[-2000:]}\nSTDERR:{out.stderr[-2000:]}"
    return out.stdout


def test_train_dry_run():
    out = run(['scripts/train.py', '--preset', 'tiny', '--dry-run',
               'training.batch_size=4'])
    assert '"batch_size": 4' in out


@pytest.mark.slow
def test_full_journey(tmp_path):
    run_root = str(tmp_path)
    # 2 ticks of synthetic-data training (tiny config has no dataset path)
    run(['scripts/train.py', '--preset', 'tiny', '--run-root', run_root,
         '--max-kimg', '0.008',
         'training.batch_size=4', 'training.tick_kimg=0.004',
         'training.snap=1', 'training.image_snap=1000'],
        timeout=2400)
    run_dirs = [d for d in os.listdir(run_root) if os.path.isdir(os.path.join(run_root, d))]
    assert len(run_dirs) == 1
    run_dir = os.path.join(run_root, run_dirs[0])
    assert os.path.exists(os.path.join(run_dir, 'experiment_config.yaml'))
    assert os.path.exists(os.path.join(run_dir, 'stats.jsonl'))
    snaps = [d for d in os.listdir(run_dir) if d.startswith('network-snapshot')
             and not d.endswith('.json')]
    assert snaps, os.listdir(run_dir)

    # resume INTO the same dir via --run-dir (frozen-config reuse): the
    # dir name embeds the git hash, so this is the cross-code-change path
    run(['scripts/train.py', '--run-dir', run_dir, '--max-kimg', '0.012'],
        timeout=2400)
    with open(os.path.join(run_dir, 'stats.jsonl')) as f:
        n_ticks = len(f.readlines())
    assert n_ticks >= 3, n_ticks

    # inference: image grid from the snapshot
    grid_path = os.path.join(run_dir, 'grid.png')
    run(['scripts/inference.py', '--run-dir', run_dir, '--vis', 'image_grid',
         '--seeds', '0-3', '--batch-size', '4', '--output', grid_path],
        timeout=2400)
    assert os.path.exists(grid_path)

    # EMA-only export (the slim cross-session artifact) -> inference from
    # the .npz must render the SAME grid as the orbax 'latest' snapshot:
    # both paths read the identical EMA params, same seeds, same program.
    npz_path = os.path.join(run_dir, 'g_ema.npz')
    run(['scripts/infra/export_ema.py', '--run-dir', run_dir,
         '--out', npz_path], timeout=600)
    assert os.path.exists(npz_path)
    grid_npz = os.path.join(run_dir, 'grid_npz.png')
    run(['scripts/inference.py', '--run-dir', run_dir, '--snapshot', npz_path,
         '--vis', 'image_grid', '--seeds', '0-3', '--batch-size', '4',
         '--output', grid_npz], timeout=2400)
    import PIL.Image
    a = np.asarray(PIL.Image.open(grid_path))
    b = np.asarray(PIL.Image.open(grid_npz))
    np.testing.assert_array_equal(a, b)

    # geometry extraction
    run(['scripts/extract_geometry.py', '--run-dir', run_dir, '--seeds', '0',
         '--resolution', '24', '--save-mrc'], timeout=2400)
    geo = os.path.join(run_dir, 'geometry')
    assert os.path.exists(os.path.join(geo, 'seed0000.obj'))
    assert os.path.exists(os.path.join(geo, 'seed0000.mrc'))
