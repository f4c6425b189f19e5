"""Gradient sanitization: zero out non-finite gradient entries.

Round-1 history: the stage-2 MC-shading backward produced isolated
non-finite gradient entries when compiled for TPU. Root cause (found and
fixed in round 2): autodiff was differentiating through the VNDF sample
*generation* and the MIS pdf in ``ops/envshade.py``, adding biased
score-function-like terms whose 1/alpha^2-scale partials overflow in
float32 on the TPU fast-math path. The reference backward
(``_optix/c_src/kernel.cu`` ``process_sample``) treats the sample
direction and MIS weight as constants; ``envshade.py`` now does the same
via ``stop_gradient`` and the repro (``scripts/repro_stage2_nan.py``,
DENOISE=1 MC_SX=4, 8 trials on v5e) is clean pre-sanitization.

Sanitization is kept as a cheap safety net (the TPU analog of the
reference's ``detect_anomaly`` finite checks, ``engine/train.py:94-95``) —
the ``nonfinite_grads`` metric must stay 0 in healthy runs."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sanitize(grads):
    """Returns (sanitized grads, scalar count of non-finite entries)."""
    leaves = jax.tree_util.tree_leaves(grads)
    count = sum(jnp.sum(~jnp.isfinite(leaf)) for leaf in leaves)
    clean = jax.tree.map(
        lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads
    )
    return clean, count
