"""3DGS training recipe: per-group LRs, densify/cull schedule, state surgery.

Parity target: ``rfstudio/trainer/gsplat_trainer.py:19`` — per-param-group
LRs (:75-118), warmup / refine-every / reset-alpha densification schedule
driving ``densify_and_cull`` plus optimizer-state surgery (:166-225), and the
SH-degree schedule (:160). TPU-first shape: the hot step is one jitted pure
function (loss + grads + optax update + screen-space grad-norm stats);
densification is a host-side callback between steps that re-indexes params
and Adam moments functionally.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..graphics.cameras import Cameras
from ..graphics.splats import Splats, densify_and_cull, cull
from ..models.gsplatter import GSplatter
from ..ops.ssim import ssim_l1_loss
from .optim import GroupOptimizers, OptimizerSpec


@dataclasses.dataclass(frozen=True)
class GSplatTrainerConfig:
    num_steps: int = 7000
    batch_size: int = 1
    base_lr: float = 1e-3
    base_eps: float = 1e-15
    pos_lr_decay: int = 4500
    warmup_length: int = 500
    refine_every: int = 100
    cull_alpha_thresh: float = 0.1
    cull_scale_thresh: float = 0.5
    continue_cull_post_densification: bool = True
    reset_alpha_every: int = 30
    densify_grad_thresh: float = 0.0002
    densify_size_thresh: float = 0.01
    num_splits: int = 2
    sh_degree_interval: int = 1000
    stop_split_at: int = 15000
    ssim_lambda: float = 0.2
    # 2DGS regularizers (reference gsplat_trainer.py:50-53): enabled after a
    # start step, applied only when the model's rasterize_mode is '2dgs'
    normal_weight: float = 5e-2
    normal_weight_start: int = 7000
    distort_weight: float = 1e-2
    distort_weight_start: int = 3000


def splats_to_params(splats: Splats) -> dict[str, jnp.ndarray]:
    return {
        "means": splats.means,
        "scales": splats.scales,
        "quats": splats.quats,
        "colors": splats.colors,
        "opacities": splats.opacities,
        "shs": splats.shs,
    }


def params_to_splats(params: dict[str, jnp.ndarray]) -> Splats:
    return Splats(**params)


class GSplatTrainer:
    """Host-side orchestration around the jitted train step."""

    def __init__(self, config: GSplatTrainerConfig, model: GSplatter, dataset_size: int):
        self.config = config
        self.model = model
        self.dataset_size = dataset_size
        c = config
        specs = {
            "means": OptimizerSpec(lr=c.base_lr * 0.16, eps=c.base_eps, lr_decay=c.pos_lr_decay),
            "scales": OptimizerSpec(lr=c.base_lr * 5, eps=c.base_eps),
            "quats": OptimizerSpec(lr=c.base_lr, eps=c.base_eps),
            "colors": OptimizerSpec(lr=c.base_lr * 2.5, eps=c.base_eps),
            "opacities": OptimizerSpec(lr=c.base_lr * 50, eps=c.base_eps),
        }
        if model.sh_degree > 0:
            specs["shs"] = OptimizerSpec(lr=c.base_lr * 0.125, eps=c.base_eps)
        self.optimizers = GroupOptimizers(specs)

    def init_state(self, splats: Splats) -> dict[str, Any]:
        params = splats_to_params(splats)
        opt_params = {k: params[k] for k in self.optimizers.txs}
        n = splats.num_gaussians
        return {
            "params": params,
            "opt_state": self.optimizers.init(opt_params),
            "xys_grad_norm": jnp.zeros((n,)),
            "vis_counts": jnp.ones((n,)),
        }

    # ---- the jitted hot step ---------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("self", "max_sh_degree"),
                       donate_argnames=("state",))
    def train_step(
        self,
        state: dict[str, Any],
        cameras: Cameras,
        gt_rgba: jnp.ndarray,  # [B, H, W, 4]
        key: jax.Array,
        max_sh_degree: int | None,
        reg_weights: tuple[jnp.ndarray | float, jnp.ndarray | float] = (0.0, 0.0),
    ) -> tuple[dict[str, Any], dict[str, jnp.ndarray]]:
        """``reg_weights`` = traced (normal_weight, distort_weight) scalars for
        the 2DGS losses; use :meth:`reg_weights_at` for the step schedule."""
        is_2dgs = self.model.rasterize_mode == "2dgs"
        normal_w, distort_w = reg_weights
        params = state["params"]
        n = params["means"].shape[0]
        bsz = gt_rgba.shape[0]
        bg_key, _ = jax.random.split(key)
        background = self.model.get_background_color(bg_key, training=True)
        gt_rgb = jnp.clip(
            gt_rgba[..., :3] + (1 - gt_rgba[..., 3:4]) * background, 0, 1
        )

        def loss_fn(p, m2d_off):
            splats = params_to_splats(p)

            def render_one(cam, off):
                rgb, info = self.model.render_rgb(
                    splats, cam, background,
                    max_sh_degree=max_sh_degree, means2d_offset=off,
                )
                if is_2dgs:
                    # normal-consistency + distortion (reference
                    # gsplat_trainer.py:135-139, gsplat.py:265-270)
                    n_loss = (
                        1.0 - jnp.sum(
                            info["normal"]
                            * (info["pseudo_normal"] * info["alpha_map"]), -1
                        )
                    ).mean()
                    d_loss = info["distort"].mean()
                    return rgb, (info["radii"], n_loss, d_loss)
                return rgb, (info["radii"], 0.0, 0.0)

            if self.model.camera_batching == "vmap":
                rgbs, (radii, n_l, d_l) = jax.vmap(render_one)(cameras, m2d_off)
            else:
                rgbs, (radii, n_l, d_l) = jax.lax.map(
                    lambda args: render_one(*args), (cameras, m2d_off)
                )
            loss = ssim_l1_loss(rgbs, gt_rgb, ssim_lambda=self.config.ssim_lambda)
            if is_2dgs:
                loss = (
                    loss + normal_w * jnp.mean(n_l) + distort_w * jnp.mean(d_l)
                )
            return loss, (rgbs, radii)

        m2d_off = jnp.zeros((bsz, n, 2))
        (loss, (rgbs, radii)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, m2d_off)
        param_grads, m2d_grads = grads

        # densification statistics (gsplat_trainer.py:175-176, gsplat.py:360-376)
        visible = (radii > 0).astype(jnp.float32)          # [B, N]
        grad_norm = jnp.linalg.norm(m2d_grads, axis=-1)    # [B, N]
        new_state = dict(state)
        new_state["xys_grad_norm"] = state["xys_grad_norm"] + (grad_norm * visible).sum(0)
        new_state["vis_counts"] = state["vis_counts"] + visible.sum(0)

        opt_params = {k: params[k] for k in self.optimizers.txs}
        opt_grads = {k: param_grads[k] for k in self.optimizers.txs}
        new_opt_params, new_opt = self.optimizers.update(
            opt_grads, state["opt_state"], opt_params
        )
        new_params = dict(params)
        new_params.update(new_opt_params)
        new_state["params"] = new_params
        new_state["opt_state"] = new_opt

        mse = jnp.mean((rgbs - gt_rgb) ** 2)
        metrics = {"loss": loss, "psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))}
        return new_state, metrics

    # ---- host-side schedule ------------------------------------------------------
    def max_sh_degree_at(self, step: int) -> int:
        return min(step // self.config.sh_degree_interval, self.model.sh_degree)

    def reg_weights_at(self, step: int) -> tuple[float, float]:
        """(normal_weight, distort_weight) 2DGS schedule — the reference's
        _normal/_distort_weight_enable flags (gsplat_trainer.py:72-73)."""
        c = self.config
        return (
            c.normal_weight if step >= c.normal_weight_start else 0.0,
            c.distort_weight if step >= c.distort_weight_start else 0.0,
        )

    def after_update(
        self, state: dict[str, Any], step: int, key: jax.Array, last_wh: tuple[int, int]
    ) -> dict[str, Any]:
        """Densify/cull/reset-opacity schedule (gsplat_trainer.py:178-225)."""
        c = self.config
        if step <= c.warmup_length or step % c.refine_every != 0:
            return state
        reset_interval = c.reset_alpha_every * c.refine_every
        splats = params_to_splats(state["params"])
        new_state = dict(state)

        def apply_map(splats_new: Splats, param_map: np.ndarray) -> None:
            params = splats_to_params(splats_new)
            new_state["params"] = params
            opt_state = dict(new_state["opt_state"])
            for g in self.optimizers.txs:
                opt_state = self.optimizers.mutate_params(
                    opt_state, group=g, param_map=param_map
                )
            new_state["opt_state"] = opt_state
            n = splats_new.num_gaussians
            new_state["xys_grad_norm"] = jnp.zeros((n,))
            new_state["vis_counts"] = jnp.ones((n,))

        scale_thresh = (
            c.cull_scale_thresh if step > c.refine_every * c.reset_alpha_every else None
        )
        if (
            step < c.stop_split_at
            and step % reset_interval > self.dataset_size + c.refine_every
        ):
            splats_new, param_map = densify_and_cull(
                splats,
                key,
                xys_grad_norm=state["xys_grad_norm"],
                vis_counts=state["vis_counts"],
                last_wh=last_wh,
                densify_grad_thresh=c.densify_grad_thresh,
                densify_size_thresh=c.densify_size_thresh,
                num_splits=c.num_splits,
                cull_alpha_thresh=c.cull_alpha_thresh,
                cull_scale_thresh=scale_thresh,
            )
            apply_map(splats_new, param_map)
        elif step >= c.stop_split_at and c.continue_cull_post_densification:
            splats_new, sel_idx = cull(
                splats,
                cull_alpha_thresh=c.cull_alpha_thresh,
                cull_scale_thresh=scale_thresh,
            )
            apply_map(splats_new, sel_idx)

        if step < c.stop_split_at and step % reset_interval == c.refine_every:
            splats2 = params_to_splats(new_state["params"]).reset_opacities(
                reset_value=c.cull_alpha_thresh * 2.0
            )
            new_state["params"] = splats_to_params(splats2)
            new_state["opt_state"] = self.optimizers.mutate_params(
                new_state["opt_state"], group="opacities", clear=True
            )
        return new_state
