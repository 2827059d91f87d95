"""Cost of the no-replacement parity pixel sampler at full resolution
(VERDICT r3 weak #7): ranking one uniform score per pixel via top_k over
all H*W pixels vs the default with-replacement randint draw.

Usage: python tools_dev/sampler_cost_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    n_rand = 4096
    for H in (400, 800):
        W = H

        def no_repl(key):
            scores = jax.random.uniform(key, (H * W,))
            _, flat = jax.lax.top_k(-scores, n_rand)
            return flat % W, flat // W

        def repl(key):
            kx, ky = jax.random.split(key)
            return (jax.random.randint(kx, (n_rand,), 0, W),
                    jax.random.randint(ky, (n_rand,), 0, H))

        for name, fn in (("no_replacement", no_repl), ("replacement", repl)):
            jf = jax.jit(fn)
            k = jax.random.PRNGKey(0)
            for _ in range(3):
                px, py = jf(k)
            float(px[0])
            t0 = time.perf_counter()
            for _ in range(50):
                px, py = jf(k)
            float(px[0])
            dt = (time.perf_counter() - t0) / 50 * 1000
            print(f"[sampler] {H}x{W} {name}: {dt:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
