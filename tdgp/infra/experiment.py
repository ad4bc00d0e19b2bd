"""Experiment configuration + reproducible run directories.

Counterpart of ref src/infra/launch.py + src/infra/utils.py + the hydra
config tree: layered YAML overlays onto the typed Config schema
(tdgp.config), dotted-key CLI overrides, resolver-computed derived values
(ref configs resolvers: log2_divide, divide, product_ab; r1 'auto' gamma,
ref train.py:176), and a frozen `experiment_config.yaml` snapshot inside
each run dir so reruns are exactly reproducible (ref launch.py:75-83).
"""
from __future__ import annotations

import dataclasses
import json
import math
import os
import subprocess
import time
from typing import Any, Dict, List, Optional, Sequence

import yaml

from tdgp import config as config_mod
from tdgp.config import Config


# --------------------------------------------------------- dataclass overlay

def _overlay(value, node):
    """Recursively overlay dict `node` onto dataclass/scalar `value`."""
    if node is None:
        return value
    if dataclasses.is_dataclass(value) and isinstance(node, dict):
        updates = {}
        names = {f.name for f in dataclasses.fields(value)}
        for k, v in node.items():
            if k not in names:
                raise KeyError(f'Unknown config key: {k} (on {type(value).__name__})')
            updates[k] = _overlay(getattr(value, k), v)
        return dataclasses.replace(value, **updates)
    if isinstance(node, list):
        return tuple(node)
    return node


def config_to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def apply_overrides(cfg: Config, overrides: Sequence[str]) -> Config:
    """Dotted-key overrides: training.batch_size=32 dataset.path=data.zip."""
    for ov in overrides:
        assert '=' in ov, f'override must be key=value: {ov}'
        key, raw = ov.split('=', 1)
        value = yaml.safe_load(raw)
        node: Dict[str, Any] = {}
        cur = node
        parts = key.split('.')
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = value
        cfg = _overlay(cfg, node)
    return cfg


PRESETS = {
    'default': config_mod.Config,
    'imagenet': config_mod.imagenet_config,
    'satellite': config_mod.satellite_config,
    'stylegan2': config_mod.stylegan2_config,
    'tiny': config_mod.tiny_test_config,
    'synth64': config_mod.synth_demo_config,
    'synth256': config_mod.synth256_config,
}


def load_config(yaml_path: Optional[str] = None, overrides: Sequence[str] = (),
                preset: str = 'default', finalize: bool = True) -> Config:
    cfg = PRESETS[preset]()
    if yaml_path:
        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
        base_preset = data.pop('preset', None)
        if base_preset:
            cfg = PRESETS[base_preset]()
        cfg = _overlay(cfg, data)
    cfg = apply_overrides(cfg, overrides)
    return finalize_config(cfg) if finalize else cfg


def finalize_config(cfg: Config) -> Config:
    """Resolver-computed derived values (ref configs/model/3dgp.yaml:83-87,
    model/base.yaml:47-50, training/base.yaml:36-39, train.py:176)."""
    res = cfg.dataset.resolution
    patch_res = cfg.generator.patch.resolution

    patch = dataclasses.replace(cfg.generator.patch,
                                min_scale_trg=patch_res / res)
    n_extra = int(math.log2(res / patch_res)) if cfg.generator.patch.enabled else 0

    gen = dataclasses.replace(
        cfg.generator, img_resolution=res, c_dim=cfg.dataset.c_dim, patch=patch,
        camera=cfg.camera,
        camera_adaptor=dataclasses.replace(cfg.generator.camera_adaptor,
                                           z_dim=cfg.generator.z_dim,
                                           c_dim=cfg.dataset.c_dim),
        white_back=cfg.dataset.white_back, last_back=cfg.dataset.last_back,
        depth_adaptor=dataclasses.replace(cfg.generator.depth_adaptor,
                                          enabled=cfg.training.use_depth))
    disc = dataclasses.replace(
        cfg.discriminator, c_dim=cfg.dataset.c_dim,
        input_resolution=patch_res if cfg.generator.patch.enabled else res,
        img_channels=4 if cfg.training.use_depth else 3,
        num_additional_start_blocks=n_extra, patch=patch,
        embedding_dim=cfg.dataset.embedding_dim)

    r1_gamma = cfg.loss.r1_gamma
    if r1_gamma < 0:  # 'auto' sentinel
        r1_gamma = 0.0002 * (res ** 2) / cfg.training.batch_size
    loss = dataclasses.replace(cfg.loss, r1_gamma=r1_gamma)

    training = dataclasses.replace(cfg.training,
                                   ema_kimg=cfg.training.batch_size * 0.3125)
    return dataclasses.replace(cfg, generator=gen, discriminator=disc, loss=loss,
                               training=training)


# --------------------------------------------------------------- run dirs

def _git_hash() -> str:
    try:
        out = subprocess.run(['git', 'rev-parse', '--short', 'HEAD'],
                             capture_output=True, text=True, check=True)
        return out.stdout.strip()
    except Exception:
        return 'nogit'


def save_config(cfg: Config, path: str) -> None:
    with open(path, 'w') as f:
        yaml.safe_dump(config_to_dict(cfg), f, sort_keys=False)


def create_experiment_dir(cfg: Config, root: str, desc: Optional[str] = None,
                          resume: bool = True) -> str:
    """Reproducible experiment dir with frozen config (ref infra/utils.py:58-84).
    Name encodes dataset/model/patch/desc + git hash."""
    name_parts = [cfg.dataset.name or 'dataset', cfg.model_name,
                  f'p{cfg.generator.patch.resolution}',
                  f'b{cfg.training.batch_size}', _git_hash()]
    if desc:
        name_parts.append(desc)
    run_dir = os.path.join(root, '-'.join(name_parts))
    if os.path.exists(run_dir) and not resume:
        run_dir = run_dir + f'-{int(time.time())}'
    os.makedirs(run_dir, exist_ok=True)
    frozen = os.path.join(run_dir, 'experiment_config.yaml')
    if not os.path.exists(frozen):
        save_config(cfg, frozen)
    return run_dir
