"""Compare two GRAD_DUMP .npz files from profile_pair_kernels.py.

The moment-precision study (BASELINE.md): GEOS_MOMENT_PREC=default computes
the backward geometry-moment matmul in one bf16 MXU pass instead of six.
The moment basis (tile-local pixel coords, integers < 256) is exact in
bf16, so the only quantization is on the [2*KC, P] d_sigma/e_da operand;
this script quantifies what that does to the op-level gradients against the
HIGHEST reference.

  python scripts/compare_grad_dumps.py ref.npz test.npz
prints per-tensor relative L2 error, cosine similarity, and max |delta|.
"""
from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    ref_path, test_path = sys.argv[1], sys.argv[2]
    ref = np.load(ref_path)
    test = np.load(test_path)
    print(f"{'tensor':<12s} {'rel_l2':>12s} {'cosine':>12s} {'max_abs':>12s}")
    for name in ref.files:
        a = ref[name].astype(np.float64).ravel()
        b = test[name].astype(np.float64).ravel()
        na = np.linalg.norm(a)
        rel = np.linalg.norm(a - b) / max(na, 1e-30)
        cos = float(a @ b / max(na * np.linalg.norm(b), 1e-30))
        print(f"{name:<12s} {rel:12.3e} {cos:12.9f} "
              f"{np.abs(a - b).max():12.3e}")


if __name__ == "__main__":
    main()
