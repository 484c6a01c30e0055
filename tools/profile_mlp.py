"""Micro-profile of the per-scale PointNet MLP matmuls at serving batch.

Times each (rows, cin)->(rows, cout) Dense layer of every grouping scale in
isolation (f32 vs bf16), plus the BN+ReLU epilogue and the masked max-pool,
to attribute the MLP-stage budget reported by ``tools/profile_stages.py``.

Usage: python tools/profile_mlp.py [--batch 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

ITERS = 30
TRIALS = 3


def timeit(name, fn, *args):
    @jax.jit
    def loop(a0, rest):
        def body(carry, _):
            out = fn(a0 + carry * jnp.asarray(1e-20, a0.dtype), *rest)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return s, ()

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return s

    jax.block_until_ready(loop(args[0], args[1:]))
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        float(loop(args[0], args[1:]))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"  {name:44s} {best * 1e3:8.3f} ms", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    b = args.batch

    # (M, K, mlps) per scale, det_base reference shapes
    scales = [
        (280, 32, (64, 64, 128)),
        (140, 64, (64, 64, 128)),
        (70, 64, (128, 128, 256)),
        (35, 128, (256, 256, 512)),
    ]

    key = jax.random.PRNGKey(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        print(f"\n=== dtype {dtype.__name__}, batch {b} ===")
        total = 0.0
        for si, (m, k, mlp) in enumerate(scales):
            cin = 3
            # on-device data: h2d uploads of (B,M,K,C) activations through
            # the relay would dwarf the timed work
            x = jax.block_until_ready(
                jax.jit(lambda kk: jax.random.normal(kk, (b, m, k, cin), dtype))(key))
            print(f"scale{si + 1} (M={m}, K={k}):", flush=True)
            for li, cout in enumerate(mlp):
                w = jnp.asarray(np.random.default_rng(1).standard_normal((cin, cout)) * 0.1, dtype)
                sc = jnp.ones((cout,), dtype)
                sh = jnp.zeros((cout,), dtype)

                def layer(x, w, sc, sh):
                    y = jnp.einsum("bmkc,cd->bmkd", x, w)
                    return jax.nn.relu(y * sc + sh)

                total += timeit(
                    f"layer{li + 1} ({cin}->{cout}) + bn/relu", layer, x, w, sc, sh)
                x = jax.block_until_ready(
                    jax.jit(lambda kk: jax.random.normal(kk, (b, m, k, cout), dtype))(key))
                cin = cout

            cnt = jnp.asarray(np.random.default_rng(2).integers(0, 3, (b, m)), jnp.int32)

            def pool(x, cnt):
                valid = (cnt > 0)[..., None, None]
                return jnp.max(jnp.where(valid, x, 0.0), axis=2)

            total += timeit("masked max-pool", pool, x, cnt)
        print(f"TOTAL (sum of isolated stages): {total * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
