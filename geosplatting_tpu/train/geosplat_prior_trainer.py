"""Mesh-prior training recipe (parity: ``rfstudio/trainer/
geosplat_prior_trainer.py:20-242``): like the MC trainer but geometry is the
vertex-offset group at lr 1e-4 (:22-108)."""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..graphics import images as gimages
from ..graphics.cameras import Cameras
from ..graphics.mesh import TriangleMesh
from ..models.geosplat import (
    field_from_groups, field_group_names, field_to_groups,
)
from ..models.geosplat_prior import GeoSplatterPrior
from ..ops.ssim import ssim_l1_loss
from .grad_utils import sanitize
from .optim import GroupOptimizers, OptimizerSpec


@dataclasses.dataclass(frozen=True)
class GeoSplatPriorTrainerConfig:
    num_steps: int = 500
    batch_size: int = 8
    geometry_lr: float = 1e-4
    cov3d_lr: float = 3e-3
    appearance_lr: float = 1e-2
    light_lr: float = 1e-2
    base_decay: int | None = 800
    base_eps: float = 1e-15
    occ_weight: float = 1e-3
    kd_grad_reg: float = 0.03
    ks_grad_reg: float = 0.03
    kd_perturb_std: float = 0.01
    ks_perturb_std: float = 0.01
    use_mask_loss: bool = True
    light_grad_scale: float = 64.0


class GeoSplatPriorTrainer:
    def __init__(self, config: GeoSplatPriorTrainerConfig, model: GeoSplatterPrior):
        self.config = config
        self.model = model
        c = config
        mk = lambda lr: OptimizerSpec(lr=lr, eps=c.base_eps, lr_decay=c.base_decay)  # noqa: E731
        specs = {
            "deform": mk(c.geometry_lr),
            "kd": mk(c.appearance_lr),
            "occ": mk(c.appearance_lr),
            "ks": mk(c.appearance_lr * 0.2),
            "z": mk(c.cov3d_lr),
            "exposure": mk(c.light_lr * 0.5),
            "light": mk(c.light_lr),
        }
        for extra in field_group_names(model.field):
            if extra not in specs:
                specs[extra] = mk(c.appearance_lr)
        self.optimizers = GroupOptimizers(specs)

    def _groups(self, p: dict) -> dict:
        g = {
            "deform": p["deform"],
            "exposure": p["exposure"],
            "light": p["latlng"],
        }
        g.update(field_to_groups(p["field"]))
        return g

    def _ungroups(self, g: dict, p: dict) -> dict:
        out = dict(p)
        out.update({
            "deform": g["deform"], "exposure": g["exposure"], "latlng": g["light"],
            "field": field_from_groups(g, p["field"]),
        })
        return out

    def init_state(self, params: dict) -> dict[str, Any]:
        return {"params": params, "opt_state": self.optimizers.init(self._groups(params))}

    def _rw(self):
        c = self.config
        return {
            "occ": jnp.asarray(c.occ_weight),
            "kd_grad": jnp.asarray(c.kd_grad_reg),
            "ks_grad": jnp.asarray(c.ks_grad_reg),
        }

    def _local_loss(self, params, base_mesh, cameras, gt_rgba, bg, rw,
                    k_render, shade_keys):
        """Per-shard / per-camera loss: every term is a per-camera mean, so
        averaging over camera slices equals the fused batch loss (the
        mean-decomposition contract, see geosplat_mc_trainer._local_loss)."""
        c = self.config
        rgba, reg, aux = self.model.render(
            params, base_mesh, cameras, k_render, reg_weights=rw,
            kd_perturb_std=c.kd_perturb_std, ks_perturb_std=c.ks_perturb_std,
            shade_keys=shade_keys,
        )
        gt_linear = gimages.srgb2rgb(gt_rgba[..., :3])
        mask = gt_rgba[..., 3:]
        img1 = rgba[..., :3] + (1 - rgba[..., 3:]) * bg
        img2 = gt_linear * mask + (1 - mask) * bg
        loss = ssim_l1_loss(img1, img2)
        if c.use_mask_loss:
            loss = loss + 5.0 * jnp.mean((mask - rgba[..., 3:]) ** 2)
        return loss + reg, (loss, reg, aux)

    @functools.partial(jax.jit, static_argnames=("self",),
                       donate_argnames=("state",))
    def train_step(
        self,
        state: dict[str, Any],
        base_mesh: TriangleMesh,
        cameras: Cameras,
        gt_rgba: jnp.ndarray,
        key: jax.Array,
        step: jnp.ndarray,
    ) -> tuple[dict[str, Any], dict[str, jnp.ndarray]]:
        rw = self._rw()
        k_render, k_bg = jax.random.split(key)
        bg = jax.random.uniform(k_bg, gt_rgba[..., :3].shape)
        sk = jax.random.split(
            jax.random.fold_in(k_render, 1), gt_rgba.shape[0]
        )
        grads, (loss, reg, aux) = jax.grad(
            lambda p: self._local_loss(
                p, base_mesh, cameras, gt_rgba, bg, rw, k_render, sk),
            has_aux=True,
        )(state["params"])
        return self._apply_grads(state, grads, loss, reg, aux)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _cam_grad(self, params, base_mesh, cameras, gt_rgba, bg, rw,
                  k_render, sk):
        """Per-camera gradient program for the split-dispatch step."""
        return jax.grad(
            lambda p: self._local_loss(
                p, base_mesh, cameras, gt_rgba, bg, rw, k_render, sk),
            has_aux=True,
        )(params)

    @functools.partial(jax.jit, static_argnames=("self", "inv"),
                       donate_argnames=("state",))
    def _apply_step(self, state, grads, loss, reg, aux, inv=1.0):
        if inv != 1.0:
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss, reg = loss * inv, reg * inv
        return self._apply_grads(state, grads, loss, reg, aux)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _slice_cam(self, cameras, gt_rgba, bg, sk, i):
        """Jitted per-camera input slicing (one dispatch, not dozens — see
        GeoSplatMCTrainer._slice_cam)."""
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i, 1, 0)  # noqa: E731
        return jax.tree.map(sl, cameras), sl(gt_rgba), sl(bg), sl(sk)

    @functools.partial(jax.jit, static_argnames=("self",),
                       donate_argnames=("acc",))
    def _acc_add(self, acc, grads, loss, reg, aux):
        g0, l0, r0, a0 = acc
        return (jax.tree.map(jnp.add, g0, grads), l0 + loss,
                r0 + reg, jax.tree.map(jnp.maximum, a0, aux))

    def train_step_accum(
        self,
        state: dict[str, Any],
        base_mesh: TriangleMesh,
        cameras: Cameras,
        gt_rgba: jnp.ndarray,
        key: jax.Array,
        step: jnp.ndarray,
    ) -> tuple[dict[str, Any], dict[str, jnp.ndarray]]:
        """Per-camera gradient accumulation as separate dispatches.

        The fused step at the prior variant's defining scale (>= 1M
        gaussians, 800^2) exceeds the remote-compile size cap (round-5
        BASELINE: the 1M demo died in remote_compile mid-response-body);
        B+1 small programs compile and run. Exactness vs the fused step:
        per-camera means average to the batch mean, regs are identical per
        camera, and shade keys / bg are generated for the GLOBAL batch and
        sliced (tests/test_dp_geosplat.py::test_prior_train_step_accum_*)."""
        rw = self._rw()
        k_render, k_bg = jax.random.split(key)
        bg = jax.random.uniform(k_bg, gt_rgba[..., :3].shape)
        sk = jax.random.split(
            jax.random.fold_in(k_render, 1), gt_rgba.shape[0]
        )
        b = gt_rgba.shape[0]
        acc = None
        for i in range(b):
            cam_i, gt_i, bg_i, sk_i = self._slice_cam(
                cameras, gt_rgba, bg, sk, jnp.asarray(i, jnp.int32)
            )
            g_i, (l_i, r_i, a_i) = self._cam_grad(
                state["params"], base_mesh, cam_i, gt_i, bg_i, rw,
                k_render, sk_i,
            )
            acc = (
                (g_i, l_i, r_i, a_i) if acc is None
                else self._acc_add(acc, g_i, l_i, r_i, a_i)
            )
        grads, loss, reg, aux = acc
        return self._apply_step(state, grads, loss, reg, aux, inv=1.0 / b)

    def _apply_grads(self, state, grads, loss, reg, aux):
        c = self.config
        g = self._groups(grads)
        g["light"] = g["light"] * c.light_grad_scale
        g, nonfinite_grads = sanitize(g)
        new_groups, new_opt = self.optimizers.update(
            g, state["opt_state"], self._groups(state["params"])
        )
        new_params = self._ungroups(new_groups, state["params"])
        new_params["latlng"] = jnp.maximum(new_params["latlng"], 1e-3)
        metrics = {
            "nonfinite_grads": nonfinite_grads,
            "loss": loss, "reg": reg,
            "num_gaussians": aux["num_gaussians"],
            "pair_fill": aux["total_pairs"] / jnp.maximum(aux["max_pairs"], 1),
        }
        return {"params": new_params, "opt_state": new_opt}, metrics
