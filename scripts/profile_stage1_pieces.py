"""Per-piece timing of the stage-1 production step on TPU.

Times each pipeline stage (geometry / field / shading / rasterize) forward
and with gradients, at the same shapes as the full 9.6 s/step workload, so
optimization effort goes to the real bottleneck.
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_stage1_pieces.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax
import jax.numpy as jnp

from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.models.geosplat import (
    GeoSplatter, get_gaussians_from_face, shade_splitsum,
)
from geosplatting_tpu.ops import cubemap as cm

W = H = int(os.environ.get("RES_IMG", 800))
RES = int(os.environ.get("RES_GRID", 96))
REPS = int(os.environ.get("REPS", 5))


def timed(name, fn, *args):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS * 1000
    print(f"{name:<42s} {dt:9.1f} ms", flush=True)
    return out


def main():
    model = GeoSplatter(resolution=RES, scale=0.8)
    params = model.init(jax.random.key(1))
    grid = model.make_grid()
    params["sdf"] = jnp.linalg.norm(grid.base_vertices(), axis=-1) - 0.45
    cam = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=15.0,
        num_samples=1, width=W, height=H,
    )[0]

    # ---- geometry ----------------------------------------------------------
    # sum every output so XLA can't DCE parts of the extraction
    def geo_all(p):
        mesh, reg, _ = model.get_geometry(p)
        return (
            mesh.vertices.sum() + mesh.indices.sum()
            + mesh.face_mask_or_ones().sum() + reg
        )

    timed("geometry fwd", jax.jit(geo_all), params)
    timed("geometry fwd+bwd", jax.jit(jax.grad(geo_all)), params)

    # ---- geometry + field + MGAdapter -------------------------------------
    def field_fn(p):
        mesh, _, _ = model.get_geometry(p)
        splats, attrs, _, valid = get_gaussians_from_face(
            model.field, p["field"], mesh, scale=model.scale,
            initial_guess=model.initial_guess_bias(),
            max_faces=model.max_render_faces,
            eval_chunk=model.field_eval_chunk,
        )
        return splats, attrs, valid

    def field_sum(p):
        sp, at, _ = field_fn(p)
        return (
            sp.means.sum() + sp.scales.sum() + sp.quats.sum()
            + sp.opacities.sum() + at.kd.sum() + at.ks.sum() + at.normals.sum()
        )

    timed("geometry+field fwd", jax.jit(field_sum), params)
    timed("geometry+field fwd+bwd", jax.jit(jax.grad(field_sum)), params)

    splats, attrs, valid = jax.jit(field_fn)(params)
    splats = jax.tree.map(jax.block_until_ready, splats)
    print(f"  live gaussians: {int(valid.sum())} / {valid.shape[0]}", flush=True)

    # ---- envmap prefilter ---------------------------------------------------
    pf = jax.jit(lambda c: sum(m.sum() for m in cm.prefilter_splitsum(
        c, num_samples=model.env_num_samples, method=model.prefilter_method
    )[1]))
    timed("env prefilter fwd", pf, params["cubemap"])
    pf_g = jax.jit(jax.grad(lambda c: sum(
        m.sum() for m in cm.prefilter_splitsum(
            c, num_samples=model.env_num_samples, method=model.prefilter_method
        )[1]
    )))
    timed("env prefilter fwd+bwd", pf_g, params["cubemap"])

    base, mips = jax.jit(functools_prefilter := (lambda c: cm.prefilter_splitsum(
        c, num_samples=model.env_num_samples, method=model.prefilter_method
    )))(params["cubemap"])

    # ---- shading + rasterize (single camera) --------------------------------
    def shade_fn(sp, at, b, ms, expo):
        rgba, _ = shade_splitsum(
            sp, at._replace(kd_jitter=None, ks_jitter=None), cam,
            exposure=expo, env_base=b, env_mips=ms,
            min_roughness=model.min_roughness, max_metallic=model.max_metallic,
            tile_capacity=model.tile_capacity,
            pairs_per_gaussian=model.pairs_per_gaussian,
            tile_chunk=model.tile_chunk, backend=model.backend,
            env_quality=model.env_quality,
        )
        return rgba

    expo = jnp.asarray(1.0)
    sh_fwd = jax.jit(lambda sp, at, b, ms: shade_fn(sp, at, b, ms, expo).sum())
    timed("shade+rasterize fwd (1 cam)", sh_fwd, splats, attrs, base, mips)
    sh_grad = jax.jit(jax.grad(
        lambda sp, at, b, ms: shade_fn(sp, at, b, ms, expo).sum(),
        argnums=(0, 1),
    ))
    timed("shade+rasterize fwd+bwd (1 cam)", sh_grad, splats, attrs, base, mips)

    # shading only (no rasterize): color computation piece
    def color_fn(sp, at, b, ms):
        from geosplatting_tpu.graphics import gmath
        camera_pos = cam.c2w[:, 3]
        wo = gmath.safe_normalize(camera_pos - sp.means)
        roughness = at.ks[:, 0:1] * 0.9 + 0.1
        n_dot_v = jnp.clip(jnp.sum(at.normals * wo, -1, keepdims=True), 1e-6, None)
        fg = cm.fg_analytic(n_dot_v, roughness)
        inv_wi = 2.0 * jnp.sum(wo * at.normals, -1, keepdims=True) * at.normals - wo
        l_diff, l_spec = cm.sample_splitsum(
            b, ms, at.normals, inv_wi, roughness,
            with_diffuse=False, filter_mode="nearest", mip_filter="nearest",
        )
        return (l_spec * fg[:, 0:1]).sum()

    timed("shading colors fwd (1 cam)", jax.jit(color_fn), splats, attrs, base, mips)
    timed(
        "shading colors fwd+bwd (1 cam)",
        jax.jit(jax.grad(color_fn, argnums=(0, 1))), splats, attrs, base, mips,
    )

    # rasterize only
    from geosplatting_tpu.graphics import gmath
    from geosplatting_tpu.ops.rasterize import rasterize

    colors = jnp.abs(attrs.kd)

    def rast_fn(m, q, s, o, c):
        r, a, _ = rasterize(
            m, q, s, o, c, cam.view_matrix, cam.intrinsic_matrix, W, H,
            rasterize_mode="antialiased", tile_capacity=model.tile_capacity,
            pairs_per_gaussian=model.pairs_per_gaussian,
            tile_chunk=model.tile_chunk, backend="pairs",
            chunk_size=int(os.environ.get("KC", model.chunk_size)),
            max_pairs_override=(
                int(os.environ["PAIRS_BUDGET"])
                if "PAIRS_BUDGET" in os.environ else None
            ),
        )
        return r.sum() + a.sum()

    args = (
        splats.means, gmath.safe_normalize(splats.quats),
        jnp.exp(splats.scales), jax.nn.sigmoid(splats.opacities[:, 0]), colors,
    )
    timed("rasterize fwd (1 cam)", jax.jit(rast_fn), *args)
    timed(
        "rasterize fwd+bwd (1 cam)",
        jax.jit(jax.grad(rast_fn, argnums=(0, 1, 2, 3, 4))), *args,
    )

    # ---- loss (SSIM-L1 + mask MSE + PSNR metric at full batch) --------------
    from geosplatting_tpu.graphics import images as gimages
    from geosplatting_tpu.ops.ssim import ssim_l1_loss

    batch = int(os.environ.get("BATCH", 8))
    rgba_b = jax.random.uniform(jax.random.key(7), (batch, H, W, 4))
    gt_b = jax.random.uniform(jax.random.key(8), (batch, H, W, 4))

    def loss_piece(rgba):
        gt_linear = gimages.srgb2rgb(gt_b[..., :3])
        mask = gt_b[..., 3:]
        bg = jax.random.uniform(jax.random.key(9), rgba[..., :3].shape)
        img1 = rgba[..., :3] + (1 - rgba[..., 3:]) * bg
        img2 = gt_linear * mask + (1 - mask) * bg
        loss = ssim_l1_loss(img1, img2)
        loss = loss + 5.0 * jnp.mean((mask - rgba[..., 3:]) ** 2)
        pred_srgb = gimages.rgb2srgb(jnp.clip(rgba[..., :3], 0, 1)) * rgba[..., 3:]
        psnr = -10.0 * jnp.log10(
            jnp.maximum(jnp.mean((pred_srgb - gt_b[..., :3] * mask) ** 2), 1e-12)
        )
        return loss + 0.0 * psnr

    timed(f"loss fwd (batch {batch})", jax.jit(loss_piece), rgba_b)
    timed(f"loss fwd+bwd (batch {batch})", jax.jit(jax.grad(loss_piece)), rgba_b)

    # ---- optimizer update (real trainer groups + Adam) ----------------------
    from geosplatting_tpu.train.geosplat_trainer import (
        GeoSplatTrainer, GeoSplatTrainerConfig,
    )

    trainer = GeoSplatTrainer(GeoSplatTrainerConfig(), model)
    state = trainer.init_state(params)

    def opt_step(st):
        grads = jax.tree.map(lambda p: p * 1e-3, st["params"])
        g = trainer._groups(grads)
        new_groups, new_opt = trainer.optimizers.update(
            g, st["opt_state"], trainer._groups(st["params"])
        )
        return trainer._ungroups(new_groups, st["params"]), new_opt

    timed("optimizer update (all groups)", jax.jit(opt_step), state)


if __name__ == "__main__":
    main()
