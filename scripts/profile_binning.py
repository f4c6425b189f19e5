"""Micro-profile the binning frontend pieces on TPU."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax
import jax.numpy as jnp

N = 50_000
MAX_PAIRS = 300_000
T = 2500
CAP = 768


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.time() - t0) / iters * 1000:9.2f} ms")
    return out


def main():
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    keys31 = jax.random.randint(k1, (MAX_PAIRS,), 0, 1 << 30, dtype=jnp.int32)
    gid = jax.random.randint(k2, (MAX_PAIRS,), 0, N, dtype=jnp.int32)
    offsets = jnp.sort(jax.random.randint(k3, (N,), 0, MAX_PAIRS, dtype=jnp.int32))
    slot = jnp.arange(MAX_PAIRS, dtype=jnp.int32)

    timeit("sort 300k single key + payload",
           jax.jit(lambda k, g: jax.lax.sort((k, g), dimension=0, num_keys=1)),
           keys31, gid)
    timeit("sort 300k key only",
           jax.jit(lambda k: jax.lax.sort((k,), dimension=0, num_keys=1)), keys31)
    timeit("sort 50k key+3 payloads",
           jax.jit(lambda k: jax.lax.sort(
               (k[:50_000], k[:50_000], k[:50_000], k[:50_000]),
               dimension=0, num_keys=1)), keys31)
    bkeys = jnp.tile(keys31[None], (8, 1))
    bgid = jnp.tile(gid[None], (8, 1))
    timeit("sort [8, 300k] batched key+payload",
           jax.jit(lambda k, g: jax.lax.sort((k, g), dimension=1, num_keys=1)),
           bkeys, bgid)
    tkeys = jax.random.randint(k4, (T, CAP), 0, 1 << 30, dtype=jnp.int32)
    timeit("sort [2500, 768] rows key+payload",
           jax.jit(lambda k: jax.lax.sort((k, k), dimension=1, num_keys=1)), tkeys)

    timeit("searchsorted 300k queries in 50k",
           jax.jit(lambda o, s: jnp.searchsorted(o, s, side="right")), offsets, slot)
    sorted_tile = jnp.sort(jax.random.randint(k4, (MAX_PAIRS,), 0, T, dtype=jnp.int32))
    tr = jnp.arange(T, dtype=jnp.int32)
    timeit("searchsorted 2x2500 queries in 300k",
           jax.jit(lambda st: (jnp.searchsorted(st, tr, side="left"),
                               jnp.searchsorted(st, tr, side="right"))), sorted_tile)
    idx = jnp.clip(
        jnp.arange(T)[:, None] * 100 + jnp.arange(CAP)[None, :], 0, MAX_PAIRS - 1)
    timeit("gather [2500,768] from 300k",
           jax.jit(lambda g, i: g[i]), gid, idx)

    # the packed-params gather in the pallas wrapper: [N, 11] -> [T, K, 11]
    src = jax.random.normal(k1, (N, 11))
    tg = jax.random.randint(k2, (T, CAP), 0, N, dtype=jnp.int32)
    timeit("gather [T,K,11] params", jax.jit(lambda s, i: s[i]), src, tg)
    # segment-sum back (bwd counterpart)
    dp = jax.random.normal(k3, (T * CAP, 11))
    seg = jnp.sort(jax.random.randint(k4, (T * CAP,), 0, N + 1, dtype=jnp.int32))
    timeit("segment_sum [T*K,11] -> N",
           jax.jit(lambda d, s: jax.ops.segment_sum(d, s, num_segments=N + 1)),
           dp, seg)


if __name__ == "__main__":
    main()
