"""Device-mesh parallelism: data-parallel map optimization over ICI.

The reference's cross-device story is thread+dual-GPU (SURVEY.md §2.4): the
pipeline on GPU 0 and loop closure on GPU 1, communicating through submap
files on disk. The TPU-native equivalent is a single `jax.sharding.Mesh`:

  - **data-parallel mapping** (`dp_map_step`): the submap's keyframes are
    sharded over the `data` axis; every device renders + differentiates its
    own keyframe against the replicated gaussian state and gradients are
    `psum`-averaged over ICI — the multi-view generalization of the
    reference's one-keyframe-per-iteration loop (mapper.py:143-170). With
    K devices one optimization step consumes K views, so wall-clock for the
    dominant hot loop divides by the mesh size;
  - **mesh-sliced loop closure** (`lc_submesh`): LC registration work is
    dispatched onto a device subset, replacing `lc.device: 1`
    (configs/Replica/replica.yaml:59) — see eags_slam_tpu.lc.

Single-chip runs degrade gracefully: mesh of 1, shard_map becomes identity.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.camera import Camera
from ..core.sh import sh_to_rgb
from ..ops.losses import isotropic_loss, masked_l1, ssim
from ..ops.rasterizer import RasterConfig, render
from ..slam.mapper import MapperConfig, OptimizedParams, _merge, _split
from ..utils import optim


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def dp_map_step(mesh: Mesh, cam: Camera, rcfg: RasterConfig, mcfg: MapperConfig):
    """Build a jitted data-parallel mapping train step over `mesh`.

    Returned step: (opt_params, adam, alive, frozen, colors_batch...) where
    keyframe arrays carry a leading device axis sharded over `data`.
    """
    axis = mesh.axis_names[0]
    lr_tree = OptimizedParams(
        xyz=mcfg.lr_xyz, log_scales=mcfg.lr_scaling,
        quats=mcfg.lr_rotation, opacity_logits=mcfg.lr_opacity,
    )

    def local_loss(opt: OptimizedParams, frozen, alive, color, depth, w2c):
        params = _merge(frozen, opt)
        out = render(params.xyz, params.quats, params.log_scales,
                     params.opacity_logits, sh_to_rgb(params.f_dc), w2c, cam,
                     rcfg, alive=alive)
        mask = (depth > 0) & ~jnp.isnan(out.depth)
        m3 = mask.astype(out.color.dtype)
        color_l1 = masked_l1(out.color, color, m3)
        closs = (1 - mcfg.lambda_dssim) * color_l1 + mcfg.lambda_dssim * (
            1.0 - ssim(out.color, color)
        )
        dloss = masked_l1(out.depth, depth, mask.astype(out.color.dtype))
        reg = isotropic_loss(params.log_scales, alive)
        return closs + dloss + reg

    def sharded_step(opt, adam, alive, frozen, colors, depths, w2cs):
        # Each device holds ONE keyframe (leading axis sharded to size 1).
        loss, grads = jax.value_and_grad(local_loss)(
            opt, frozen, alive, colors[0], depths[0], w2cs[0]
        )
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, axis), grads)
        loss = jax.lax.pmean(loss, axis)
        gmask = alive.astype(jnp.float32)
        grads = jax.tree.map(
            lambda g: g * gmask.reshape((-1,) + (1,) * (g.ndim - 1)), grads
        )
        new_opt, new_adam = optim.adam_update(adam, opt, grads, lr_tree)
        return new_opt, new_adam, loss

    step = shard_map(
        sharded_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )

    @jax.jit
    def train_step(state, adam, kf_colors, kf_depths, kf_w2cs):
        opt = _split(state.params)
        new_opt, new_adam, loss = step(
            opt, adam, state.alive, state.params, kf_colors, kf_depths, kf_w2cs
        )
        return state._replace(params=_merge(state.params, new_opt)), new_adam, loss

    def init_adam(state):
        return optim.adam_init(_split(state.params))

    return train_step, init_adam


def lc_submesh(mesh: Mesh, n_lc_devices: int = 2) -> Mesh:
    """Carve an LC slice off the mesh (the `lc.device: 1` equivalent)."""
    devs = list(mesh.devices.flat)
    n_lc = min(n_lc_devices, max(len(devs) - 1, 1))
    return Mesh(devs[-n_lc:], ("lc",))
