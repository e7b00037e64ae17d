"""A/B the merged-group plans on hardware: time chained
_fused_wow_group launches for candidate plans at 4k L6."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from wavelets_tpu.ops import pallas_conv as PC
from wavelets_tpu.ops.filters import B3SPLINE

ssum = jax.jit(jnp.sum)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
float(ssum(x))
print("warm", flush=True)

PLANS = [
    [(0, 3), (3, 2), (5, 1)],
    [(0, 5), (5, 1)],
    [(0, 4), (4, 2)],
    [(0, 2), (2, 2), (4, 2)],
]


def runner(plan):
    @jax.jit
    def f(v):
        cur = v
        recon = None
        for off, g in plan:
            fac = jnp.ones((g,), jnp.float32)
            thr = jnp.zeros((g,), jnp.float32)
            cube, acc = PC._fused_wow_group(
                cur, fac, thr, g, B3SPLINE, offset=off,
                masked=(False,) * g)
            cur = cube[g]
            recon = acc if recon is None else recon + acc
        return recon + cur
    return f


for plan in PLANS:
    try:
        f = runner(plan)
        z = f(x)
        float(ssum(z))
        t0 = time.perf_counter()
        for _ in range(20):
            z = f(z)
        float(ssum(z))
        dt = (time.perf_counter() - t0) / 20 * 1e3
        print(f"plan {plan}: {dt:.2f} ms", flush=True)
    except Exception as e:
        print(f"plan {plan}: FAILED {type(e).__name__} {e}", flush=True)

print("PLANAB-DONE", flush=True)
