#!/usr/bin/env python
"""Experiment launcher (ref: src/infra/launch.py + slurm_job.py).

Creates a reproducible experiment dir (frozen experiment_config.yaml +
training_cmd.sh), refuses to launch from a dirty git tree unless --allow-dirty
(ref infra/utils.py:58-84), then either runs locally or submits a chain of
dependent slurm jobs (`--dependency=afterany`, ref launch.py:93-114) so
training resumes across preemptions via training.resume=latest.

Usage:
  python -m tdgp.infra.launch --config configs/dataset/dogs.yaml \
      [--slurm --num-jobs 4 --partition gpu] [--print-only] [overrides...]
"""
from __future__ import annotations

import argparse
import os
import shlex
import subprocess
import sys


def git_is_dirty() -> bool:
    try:
        out = subprocess.run(['git', 'status', '--porcelain'], capture_output=True,
                             text=True, check=True)
        return bool(out.stdout.strip())
    except Exception:
        return False


SLURM_TEMPLATE = """#!/bin/bash
#SBATCH --job-name={name}
#SBATCH --output={run_dir}/slurm-%j.out
{partition_line}
{extra_lines}
cd {repo_root}
{cmd}
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default=None)
    ap.add_argument('--preset', default='default')
    ap.add_argument('--run-root', default='experiments')
    ap.add_argument('--desc', default=None)
    ap.add_argument('--allow-dirty', action='store_true')
    ap.add_argument('--print-only', action='store_true')
    ap.add_argument('--slurm', action='store_true')
    ap.add_argument('--num-jobs', type=int, default=1,
                    help='chained dependent slurm jobs (resume across preemption)')
    ap.add_argument('--partition', default=None)
    ap.add_argument('--slurm-extra', default='', help='extra #SBATCH lines, ;-separated')
    ap.add_argument('overrides', nargs='*')
    args = ap.parse_args()

    if git_is_dirty() and not args.allow_dirty:
        sys.exit('Refusing to launch from a dirty git tree (use --allow-dirty). '
                 'The frozen config must correspond to a commit.')

    from tdgp.infra.experiment import create_experiment_dir, load_config
    cfg = load_config(args.config, overrides=args.overrides, preset=args.preset)
    run_dir = create_experiment_dir(cfg, args.run_root, desc=args.desc)
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    frozen = os.path.join(run_dir, 'experiment_config.yaml')
    cmd = (f'{sys.executable} scripts/train.py --config {shlex.quote(frozen)} '
           f'--run-root {shlex.quote(os.path.dirname(run_dir) or ".")}')
    cmd_path = os.path.join(run_dir, 'training_cmd.sh')
    with open(cmd_path, 'w') as f:
        f.write('#!/bin/bash\n' + cmd + '\n')
    os.chmod(cmd_path, 0o755)
    print(f'Run dir: {run_dir}')
    print(f'Command: {cmd}')

    if args.print_only:
        return

    if not args.slurm:
        subprocess.run(['bash', cmd_path], check=True, cwd=repo_root)
        return

    # chained sbatch submission (ref launch.py:93-114)
    partition_line = f'#SBATCH --partition={args.partition}' if args.partition else ''
    extra_lines = '\n'.join(l for l in args.slurm_extra.split(';') if l)
    script = SLURM_TEMPLATE.format(name=os.path.basename(run_dir), run_dir=run_dir,
                                   partition_line=partition_line,
                                   extra_lines=extra_lines, repo_root=repo_root,
                                   cmd=cmd)
    script_path = os.path.join(run_dir, 'slurm_job.sh')
    with open(script_path, 'w') as f:
        f.write(script)
    prev_job = None
    for i in range(args.num_jobs):
        sbatch = ['sbatch']
        if prev_job:
            sbatch.append(f'--dependency=afterany:{prev_job}')
        sbatch.append(script_path)
        out = subprocess.run(sbatch, capture_output=True, text=True, check=True)
        prev_job = out.stdout.strip().split()[-1]
        print(f'submitted job {i + 1}/{args.num_jobs}: {prev_job}')


if __name__ == '__main__':
    main()
