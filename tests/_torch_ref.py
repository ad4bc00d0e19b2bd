"""Utilities to load the reference (torch CPU) 3DGP code for parity tests.

The reference at /root/reference is PyTorch 1.11-era code; this shims the
few missing runtime deps (torchvision, omegaconf — both used only as type
annotations / unexercised helpers on the G forward path) and builds matched
config objects for the reference Generator and ours.
"""
import sys
import types

REF_ROOT = '/root/reference'


def _easydict_cls():
    class EasyDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    return EasyDict


def nested_easydict(d):
    ed = _easydict_cls()

    def rec(x):
        if isinstance(x, dict):
            return ed({k: rec(v) for k, v in x.items()})
        return x
    return rec(d)


def load_reference_epigraf():
    """Import src.training.networks_epigraf from the reference tree."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if 'torchvision' not in sys.modules:
        tv = types.ModuleType('torchvision')
        sys.modules['torchvision'] = tv
    if 'omegaconf' not in sys.modules:
        oc = types.ModuleType('omegaconf')

        class DictConfig(dict):
            pass
        oc.DictConfig = DictConfig
        oc.OmegaConf = types.SimpleNamespace()
        sys.modules['omegaconf'] = oc
    import src.training.networks_epigraf as ref_epigraf  # noqa: E402
    return ref_epigraf


def make_parity_cfgs(tri_res=64, feat_dim=16, mlp_hid=32, z_dim=64, w_dim=64,
                     c_dim=4, cbase=2048, cmax=128, img_res=64, steps=8,
                     map_depth=2):
    """Matched (reference EasyDict cfg, tdgp Config) pair for G parity.

    Mirrors configs/model/3dgp.yaml semantics with reduced dims. Depth and
    camera adaptors are disabled: the depth adaptor's head selection is
    stochastic even at eval (ref networks_depth_adaptor.py out_strategy) and
    the camera adaptor acts outside G.forward (ref loss.py run_G).
    """
    ray = dict(start=0.75, end=1.25)
    ref_cfg = nested_easydict(dict(
        z_dim=z_dim, w_dim=w_dim, c_dim=c_dim, map_depth=map_depth,
        cbase=cbase, cmax=cmax, fmaps=1.0,
        num_ray_steps=steps, max_batch_res=1024,
        ray_marcher_type='classical', use_noise=True,
        use_inf_depth=True, use_full_box=False, has_view_cond=False,
        density_bias=0.0,
        nerf_noise_std_init=1.0, nerf_noise_kimg_growth=5000,
        tri_plane=dict(res=tri_res, feat_dim=feat_dim,
                       mlp=dict(n_layers=2, hid_dim=mlp_hid)),
        patch=dict(enabled=False, resolution=img_res),
        camera=dict(cube_scale=0.5, ray=dict(**ray)),
        depth_adaptor=dict(enabled=False),
        camera_adaptor=dict(enabled=False),
        dataset=dict(last_back=False, white_back=False),
    ))

    from tdgp.config import (CameraAdaptorCfg, CameraConfig, DepthAdaptorCfg,
                             GeneratorConfig, PatchCfg, RayCfg, TriPlaneCfg,
                             TriPlaneMLPCfg)
    cam = CameraConfig(cube_scale=0.5, ray=RayCfg(start=ray['start'], end=ray['end']))
    our_cfg = GeneratorConfig(
        z_dim=z_dim, w_dim=w_dim, c_dim=c_dim, map_depth=map_depth,
        cbase=cbase, cmax=cmax, img_resolution=img_res, num_ray_steps=steps,
        num_fp16_res=0, fp32_only=True, use_noise=True,
        camera_cond=True, camera_cond_raw=True, camera_cond_drop_p=0.0,
        tri_plane=TriPlaneCfg(res=tri_res, feat_dim=feat_dim,
                              mlp=TriPlaneMLPCfg(n_layers=2, hid_dim=mlp_hid)),
        patch=PatchCfg(enabled=False, resolution=img_res),
        camera=cam,
        depth_adaptor=DepthAdaptorCfg(enabled=False),
        camera_adaptor=CameraAdaptorCfg(enabled=False),
        plane_sample_impl='jnp',
    )
    return ref_cfg, our_cfg
