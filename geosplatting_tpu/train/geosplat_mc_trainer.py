"""Stage-2 (GeoSplatterMC) training recipe.

Parity target: ``rfstudio/trainer/geosplat_mc_trainer.py:19`` — 9 Adam
groups with a 50-step warmup on geometry (:61-128), latlng grad x64,
occ_weight = 1e-3 (:59), SSIM-L1 in linear space on random-background
composites + mask MSE (:145-180)."""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..graphics import images as gimages
from ..graphics.cameras import Cameras
from ..models.geosplat import (
    field_from_groups, field_group_names, field_to_groups,
)
from ..models.geosplat_mc import GeoSplatterMC
from ..ops.ssim import ssim_l1_loss
from .grad_utils import sanitize
from .optim import GroupOptimizers, OptimizerSpec


def _ramp(begin, end, decay, step):
    if decay <= 0:
        return jnp.asarray(begin)
    return begin - (begin - end) * jnp.minimum(1.0, step / decay)


@dataclasses.dataclass(frozen=True)
class GeoSplatMCTrainerConfig:
    num_steps: int = 500
    batch_size: int = 8
    cov3d_lr: float = 3e-3
    geometry_lr: float = 3e-3
    appearance_lr: float = 1e-2
    light_lr: float = 1e-2
    base_decay: int | None = 800
    base_eps: float = 1e-15
    geometry_warm_up: int = 50
    sdf_reg_begin: float = 0.2
    sdf_reg_end: float = 0.01
    sdf_reg_decay: int = 500
    occ_weight: float = 1e-3
    kd_grad_reg: float = 0.03
    ks_grad_reg: float = 0.03
    kd_perturb_std: float = 0.01
    ks_perturb_std: float = 0.01
    use_mask_loss: bool = True
    light_grad_scale: float = 64.0


class GeoSplatMCTrainer:
    def __init__(self, config: GeoSplatMCTrainerConfig, model: GeoSplatterMC):
        self.config = config
        self.model = model
        c = config
        geo = lambda: OptimizerSpec(  # noqa: E731
            lr=c.geometry_lr, eps=c.base_eps, lr_decay=c.base_decay,
            warm_up=c.geometry_warm_up,
        )
        specs = {
            "deform": geo(),
            "weights": geo(),
            "sdf": geo(),
            "kd": OptimizerSpec(lr=c.appearance_lr, eps=c.base_eps, lr_decay=c.base_decay),
            "occ": OptimizerSpec(lr=c.appearance_lr, eps=c.base_eps, lr_decay=c.base_decay),
            "ks": OptimizerSpec(lr=c.appearance_lr * 0.2, eps=c.base_eps, lr_decay=c.base_decay),
            "z": OptimizerSpec(lr=c.cov3d_lr, eps=c.base_eps, lr_decay=c.base_decay),
            "exposure": OptimizerSpec(lr=c.light_lr * 0.5, eps=c.base_eps, lr_decay=c.base_decay),
            "light": OptimizerSpec(lr=c.light_lr, eps=c.base_eps, lr_decay=c.base_decay),
        }
        for extra in field_group_names(model.field):
            if extra not in specs:
                specs[extra] = OptimizerSpec(
                    lr=c.appearance_lr, eps=c.base_eps, lr_decay=c.base_decay
                )
        self.optimizers = GroupOptimizers(specs)

    def _groups(self, params: dict) -> dict:
        g = {
            "deform": params["deform"],
            "weights": params["weights"],
            "sdf": params["sdf"],
            "exposure": params["exposure"],
            "light": params["latlng"],
        }
        g.update(field_to_groups(params["field"]))
        return g

    def _ungroups(self, g: dict, template: dict) -> dict:
        return {
            "deform": g["deform"],
            "weights": g["weights"],
            "sdf": g["sdf"],
            "exposure": g["exposure"],
            "latlng": g["light"],
            "field": field_from_groups(g, template["field"]),
        }

    def init_state(self, params: dict) -> dict[str, Any]:
        return {"params": params, "opt_state": self.optimizers.init(self._groups(params))}

    def _reg_weights(self, step: jnp.ndarray) -> dict:
        c = self.config
        return {
            "sdf": _ramp(c.sdf_reg_begin, c.sdf_reg_end, c.sdf_reg_decay, step),
            "occ": jnp.asarray(c.occ_weight),
            "kd_grad": jnp.asarray(c.kd_grad_reg),
            "ks_grad": jnp.asarray(c.ks_grad_reg),
        }

    def _local_loss(self, params, cameras, gt_rgba, bg, rw, k_render,
                    shade_keys=None):
        """Per-shard loss (see geosplat_trainer._local_loss for the dp
        mean-decomposition contract)."""
        c = self.config
        rgba, reg, aux = self.model.render(
            params, cameras, k_render, reg_weights=rw,
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
        pred_srgb = gimages.rgb2srgb(jnp.clip(rgba[..., :3], 0, 1)) * rgba[..., 3:]
        mse = jnp.mean((pred_srgb - gt_rgba[..., :3] * mask) ** 2)
        return loss + reg, ((loss, mse, reg), aux)

    @functools.partial(jax.jit, static_argnames=("self",),
                       donate_argnames=("state",))
    def train_step(
        self,
        state: dict[str, Any],
        cameras: Cameras,
        gt_rgba: jnp.ndarray,
        key: jax.Array,
        step: jnp.ndarray,
    ) -> tuple[dict[str, Any], dict[str, jnp.ndarray]]:
        rw = self._reg_weights(step)
        k_render, k_bg = jax.random.split(key)
        bg = jax.random.uniform(k_bg, gt_rgba[..., :3].shape)
        sk = jax.random.split(
            jax.random.fold_in(k_render, 1), gt_rgba.shape[0]
        )
        grads, ((loss, mse, reg), aux) = jax.grad(
            lambda p: self._local_loss(
                p, cameras, gt_rgba, bg, rw, k_render, sk),
            has_aux=True,
        )(state["params"])
        return self._apply_grads(state, grads, loss, mse, reg, aux)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _cam_grad(self, params, cameras, gt_rgba, bg, rw, k_render, sk):
        """Per-camera gradient program for the split-dispatch step."""
        return jax.grad(
            lambda p: self._local_loss(p, cameras, gt_rgba, bg, rw, k_render,
                                       sk),
            has_aux=True,
        )(params)

    @functools.partial(jax.jit, static_argnames=("self", "inv"),
                       donate_argnames=("state",))
    def _apply_step(self, state, grads, loss, mse, reg, aux, inv=1.0):
        if inv != 1.0:
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss, mse, reg = loss * inv, mse * inv, reg * inv
        return self._apply_grads(state, grads, loss, mse, reg, aux)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _slice_cam(self, cameras, gt_rgba, bg, sk, i):
        """One program for all the per-camera input slicing (round 5: the
        accum loop's host-side ``x[i:i+1]`` glue was hundreds of tiny
        remote calls per step; bursty small-RPC traffic wedged the
        tunnel — see BASELINE.md round-5 'wedge' postmortem)."""
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i, 1, 0)  # noqa: E731
        return jax.tree.map(sl, cameras), sl(gt_rgba), sl(bg), sl(sk)

    @functools.partial(jax.jit, static_argnames=("self",),
                       donate_argnames=("acc",))
    def _acc_add(self, acc, grads, loss, mse, reg, aux):
        """Accumulate one camera's gradient contribution in ONE dispatch."""
        g0, l0, m0, r0, a0 = acc
        return (jax.tree.map(jnp.add, g0, grads), l0 + loss, m0 + mse,
                r0 + reg, jax.tree.map(jnp.maximum, a0, aux))

    def train_step_accum(
        self,
        state: dict[str, Any],
        cameras: Cameras,
        gt_rgba: jnp.ndarray,
        key: jax.Array,
        step: jnp.ndarray,
    ) -> tuple[dict[str, Any], dict[str, jnp.ndarray]]:
        """Reference-style per-camera gradient accumulation as SEPARATE
        dispatches (base_trainer.py:36 num_accums_per_batch analog).

        The fused ``train_step`` — camera lax.map x remat x 64-sample
        checkpointed scan x sphere-trace scan in ONE program — exceeds the
        remote TPU compile size cap at the production shape (round-4/5
        BASELINE postmortems); B small programs compile in minutes and run
        at parity with the fused map. Loss terms are per-camera means, so
        averaging per-camera gradients is exact; the regularizers
        (params-only, identical per camera) stay correct because every
        per-camera loss carries reg and the mean of identical values is
        the value. The whole step is ~3B+1 dispatches (slice / grad /
        accumulate per camera + apply): everything else lives inside jit
        so the remote tunnel sees few, large requests."""
        rw = self._reg_weights(step)
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
            g_i, ((l_i, m_i, r_i), a_i) = self._cam_grad(
                state["params"], cam_i, gt_i, bg_i, rw, k_render, sk_i,
            )
            acc = (
                (g_i, l_i, m_i, r_i, a_i) if acc is None
                else self._acc_add(acc, g_i, l_i, m_i, r_i, a_i)
            )
        grads, loss, mse, reg, aux = acc
        return self._apply_step(
            state, grads, loss, mse, reg, aux, inv=1.0 / b
        )

    @functools.partial(jax.jit, static_argnames=("self", "mesh"),
                       donate_argnames=("state",))
    def train_step_dp(
        self,
        state: dict[str, Any],
        cameras: Cameras,
        gt_rgba: jnp.ndarray,
        key: jax.Array,
        step: jnp.ndarray,
        mesh,
    ) -> tuple[dict[str, Any], dict[str, jnp.ndarray]]:
        """Camera-batch data-parallel step (see train/dp.py)."""
        from .dp import dp_value_and_grad

        rw = self._reg_weights(step)
        k_render, k_bg = jax.random.split(key)
        bg = jax.random.uniform(k_bg, gt_rgba[..., :3].shape)
        # per-camera MC sample keys generated for the GLOBAL batch and
        # sharded with the cameras: dp == single-device bit-for-bit
        sk = jax.random.split(
            jax.random.fold_in(k_render, 1), gt_rgba.shape[0]
        )
        grads, (loss, mse, reg), aux = dp_value_and_grad(
            lambda p, cams, gt, bg_, sk_: self._local_loss(
                p, cams, gt, bg_, rw, k_render, sk_
            ),
            state["params"], mesh, cameras, gt_rgba, bg, sk,
        )
        return self._apply_grads(state, grads, loss, mse, reg, aux)

    def _apply_grads(self, state, grads, loss, mse, reg, aux):
        c = self.config
        psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
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
            "loss": loss, "reg": reg, "splat_psnr": psnr,
            "num_gaussians": aux["num_gaussians"],
            "pair_fill": aux["total_pairs"] / jnp.maximum(aux["max_pairs"], 1),
            "exposure": jnp.exp(state["params"]["exposure"][0]),
        }
        return {"params": new_params, "opt_state": new_opt}, metrics
