"""Stage-1 GeoSplatter training recipe.

Parity target: ``rfstudio/trainer/geosplat_trainer.py:20`` — 8 Adam groups
(deforms/sdf/weights/kd/ks/z/exposure/light, :82-139), cubemap grad x64
(:71-72), initial-guess LR overrides (:74-80), vertex-sampling warmup
(:217-222), linear reg-weight schedules (:224-259), SSIM+L1 on random-
background-composited linear-space images + 5x mask MSE (:169-180), and the
envmap clamp >= 1e-2 after each step (:266).

TPU shape: one jitted train step; schedule weights enter as traced scalars;
the only recompile boundary is the vertex->face sampling switch at step 50.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..graphics import images as gimages
from ..graphics.cameras import Cameras
from ..models.geosplat import (
    GeoSplatter, field_from_groups, field_group_names, field_to_groups,
)
from ..ops.ssim import ssim_l1_loss
from .grad_utils import sanitize
from .optim import GroupOptimizers, OptimizerSpec


@dataclasses.dataclass(frozen=True)
class GeoSplatTrainerConfig:
    num_steps: int = 500
    batch_size: int = 8
    cov3d_lr: float = 3e-3
    geometry_lr: float = 1e-2
    appearance_lr: float = 3e-3
    light_lr: float = 1e-2
    base_decay: int | None = 800
    base_eps: float = 1e-15
    vertex_sample_warmup: int = 50
    light_reg_begin: float = 2e-3
    light_reg_end: float = 2e-3
    light_reg_decay: int = 500
    sdf_reg_begin: float = 0.2
    sdf_reg_end: float = 0.12
    sdf_reg_decay: int = 500
    occ_reg_begin: float = 0.0
    occ_reg_end: float = 0.0
    occ_reg_decay: int = 0
    kd_grad_reg_begin: float = 0.0
    kd_grad_reg_end: float = 0.03
    kd_grad_reg_decay: int = 500
    kd_perturb_std: float = 0.01
    ks_grad_reg_begin: float = 0.0
    ks_grad_reg_end: float = 0.001
    ks_grad_reg_decay: int = 500
    ks_perturb_std: float = 0.01
    use_mask_loss: bool = True
    light_grad_scale: float = 64.0


def _ramp(begin: float, end: float, decay: int, step: jnp.ndarray) -> jnp.ndarray:
    if decay <= 0:
        return jnp.asarray(begin)
    t = jnp.minimum(1.0, step / decay)
    return begin - (begin - end) * t


class GeoSplatTrainer:
    def __init__(self, config: GeoSplatTrainerConfig, model: GeoSplatter):
        self.config = config
        self.model = model
        c = config
        geometry_lr = c.geometry_lr
        light_lr = c.light_lr
        if model.initial_guess == "specular":
            geometry_lr *= 5
            light_lr *= 3
        elif model.initial_guess == "glossy":
            light_lr *= 3
        self.reg_overrides = {}
        if model.initial_guess == "specular":
            self.reg_overrides = {"kd_grad_begin": 0.5, "ks_grad_begin": 0.1}
        mk = lambda lr: OptimizerSpec(lr=lr, eps=c.base_eps, lr_decay=c.base_decay)  # noqa: E731
        specs = {
            "deform": mk(geometry_lr),
            "sdf": mk(geometry_lr),
            "weights": mk(geometry_lr),
            "kd": mk(c.appearance_lr),
            "ks": mk(c.appearance_lr * 0.5),
            "z": mk(c.cov3d_lr),
            "exposure": mk(light_lr * 0.5),
            "light": mk(light_lr),
        }
        for extra in field_group_names(model.field):
            if extra not in specs:
                specs[extra] = mk(c.appearance_lr)  # shared trunk planes / occ
        self.optimizers = GroupOptimizers(specs)

    # param pytree <-> optimizer groups
    def _groups(self, params: dict) -> dict:
        g = {
            "deform": params["deform"],
            "sdf": params["sdf"],
            "weights": params["weights"],
            "exposure": params["exposure"],
            "light": params["cubemap"],
        }
        g.update(field_to_groups(params["field"]))
        return g

    def _ungroups(self, groups: dict, template: dict) -> dict:
        return {
            "deform": groups["deform"],
            "sdf": groups["sdf"],
            "weights": groups["weights"],
            "exposure": groups["exposure"],
            "cubemap": groups["light"],
            "field": field_from_groups(groups, template["field"]),
        }

    def init_state(self, params: dict) -> dict[str, Any]:
        return {"params": params, "opt_state": self.optimizers.init(self._groups(params))}

    def reg_weights(self, step: jnp.ndarray) -> dict:
        c = self.config
        kd_begin = self.reg_overrides.get("kd_grad_begin", c.kd_grad_reg_begin)
        ks_begin = self.reg_overrides.get("ks_grad_begin", c.ks_grad_reg_begin)
        return {
            "light": _ramp(c.light_reg_begin, c.light_reg_end, c.light_reg_decay, step),
            "sdf": _ramp(c.sdf_reg_begin, c.sdf_reg_end, c.sdf_reg_decay, step),
            "occ": _ramp(c.occ_reg_begin, c.occ_reg_end, c.occ_reg_decay, step),
            "kd_grad": _ramp(kd_begin, c.kd_grad_reg_end, c.kd_grad_reg_decay, step),
            "ks_grad": _ramp(ks_begin, c.ks_grad_reg_end, c.ks_grad_reg_decay, step),
        }

    def _local_loss(self, params, cameras, gt_rgba, bg, rw, k_render, sampling):
        """Per-shard loss: every batch-dependent term is a MEAN over the
        local camera shard, so dp (train/dp.py) pmean's to the exact
        full-batch value; reg/aux depend on params only (replicated)."""
        c = self.config
        rgba, reg, aux = self.model.render(
            params, cameras, k_render,
            reg_weights=rw,
            kd_perturb_std=c.kd_perturb_std,
            ks_perturb_std=c.ks_perturb_std,
            sampling=sampling,
        )
        # loss in linear space w/ per-pixel random background
        # (geosplat_trainer.py:169-180)
        gt_linear = gimages.srgb2rgb(gt_rgba[..., :3])
        mask = gt_rgba[..., 3:]
        img1 = rgba[..., :3] + (1 - rgba[..., 3:]) * bg
        img2 = gt_linear * mask + (1 - mask) * bg
        loss = ssim_l1_loss(img1, img2)
        if c.use_mask_loss:
            loss = loss + 5.0 * jnp.mean((mask - rgba[..., 3:]) ** 2)
        # sRGB-space MSE for the PSNR metric (log taken after any pmean)
        pred_srgb = gimages.rgb2srgb(
            jnp.clip(rgba[..., :3], 0, 1)
        ) * rgba[..., 3:]
        gt_srgb = gt_rgba[..., :3] * mask
        mse = jnp.mean((pred_srgb - gt_srgb) ** 2)
        return loss + reg, ((loss, mse, reg), aux)

    @functools.partial(jax.jit, static_argnames=("self", "sampling"),
                       donate_argnames=("state",))
    def train_step(
        self,
        state: dict[str, Any],
        cameras: Cameras,
        gt_rgba: jnp.ndarray,   # [B, H, W, 4] sRGB-encoded rgba
        key: jax.Array,
        step: jnp.ndarray,
        sampling: str = "face",
    ) -> tuple[dict[str, Any], dict[str, jnp.ndarray]]:
        rw = self.reg_weights(step)
        k_render, k_bg = jax.random.split(key)
        bg = jax.random.uniform(k_bg, gt_rgba[..., :3].shape)

        grads, ((loss, mse, reg), aux) = jax.grad(
            lambda p: self._local_loss(
                p, cameras, gt_rgba, bg, rw, k_render, sampling
            ),
            has_aux=True,
        )(state["params"])
        return self._apply_grads(state, grads, loss, mse, reg, aux)

    @functools.partial(jax.jit, static_argnames=("self", "sampling", "mesh"),
                       donate_argnames=("state",))
    def train_step_dp(
        self,
        state: dict[str, Any],
        cameras: Cameras,
        gt_rgba: jnp.ndarray,
        key: jax.Array,
        step: jnp.ndarray,
        mesh,                     # jax.sharding.Mesh with a 'dp' axis
        sampling: str = "face",
    ) -> tuple[dict[str, Any], dict[str, jnp.ndarray]]:
        """Camera-batch data-parallel step: each device renders its camera
        shard (the per-camera lax.map is sequential, so shard_map — not
        sharding annotations — is what splits it); one pmean over ICI merges
        gradients. Equal to ``train_step`` up to float reassociation."""
        from .dp import dp_value_and_grad

        rw = self.reg_weights(step)
        k_render, k_bg = jax.random.split(key)
        bg = jax.random.uniform(k_bg, gt_rgba[..., :3].shape)

        grads, (loss, mse, reg), aux = dp_value_and_grad(
            lambda p, cams, gt, bg_: self._local_loss(
                p, cams, gt, bg_, rw, k_render, sampling
            ),
            state["params"], mesh, cameras, gt_rgba, bg,
        )
        return self._apply_grads(state, grads, loss, mse, reg, aux)

    def _apply_grads(self, state, grads, loss, mse, reg, aux):
        c = self.config
        psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
        g = self._groups(grads)
        g["light"] = g["light"] * c.light_grad_scale  # cubemap grad x64 hook
        g, nonfinite_grads = sanitize(g)
        new_groups, new_opt = self.optimizers.update(
            g, state["opt_state"], self._groups(state["params"])
        )
        new_params = self._ungroups(new_groups, state["params"])
        # envmap clamp (geosplat_trainer.py:266)
        new_params["cubemap"] = jnp.maximum(new_params["cubemap"], 1e-2)
        metrics = {
            "nonfinite_grads": nonfinite_grads,
            "loss": loss,
            "reg": reg,
            "splat_psnr": psnr,
            "num_gaussians": aux["num_gaussians"],
            "num_surf_cubes": aux["num_surf_cubes"],
            "num_surf_edges": aux["num_surf_edges"],
            # budget-overflow observables: >1.0 pair_fill or face_fill means
            # silent truncation is degrading renders (VERDICT r1 weak #4)
            "pair_fill": aux["total_pairs"] / jnp.maximum(aux["max_pairs"], 1),
            "face_fill": aux["num_faces_valid"]
            / jnp.maximum(aux["max_render_faces"], 1),
            "exposure": jnp.exp(state["params"]["exposure"][0]),
        }
        return {"params": new_params, "opt_state": new_opt}, metrics

    def sampling_at(self, step: int) -> str:
        if self.config.vertex_sample_warmup > 0 and step < self.config.vertex_sample_warmup:
            return "vertex"
        return "face"
