#!/usr/bin/env python
"""Roofline report for the hot kernels on the attached TPU.

Measures steady-state times (chained iterations, forced sync — see
bench.py for why) and compares each stage against its analytic
bytes/FLOPs bound from ``wavelets_tpu.utils.profiling``.

Usage: cd /root/repo && python scripts/roofline_report.py [N]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import importlib
W = importlib.import_module("wavelets_tpu.models.wow")
from wavelets_tpu.core.transform import decompose
from wavelets_tpu.ops.filters import B3SPLINE
from wavelets_tpu.utils.profiling import (
    Cost,
    decompose_cost,
    roofline,
    wow_cost,
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    rows = []

    def report(name, fn, cost):
        r = roofline(fn, (x,), cost, iters=10)
        rows.append((name, r))
        print(f"{name:34s} {r['measured_ms']:8.2f} ms | bound "
              f"{r['bound_ms']:7.2f} ms | {100 * r['roofline_fraction']:5.1f}% "
              f"| {r['achieved_gbps']:6.1f} GB/s", flush=True)

    for L in (6, 10):
        f = jax.jit(lambda a, l=L: jnp.sum(
            decompose(a, l, B3SPLINE), axis=0))
        report(f"decompose+synthesize L{L}", f,
               decompose_cost((n, n), L, B3SPLINE))

    zero = jnp.zeros((), jnp.float32)
    for L in (6, 10):
        st = dict(sf=B3SPLINE, n_scales=L, weights=(1.0,) * (L + 1),
                  whitening=True,
                  denoise_coefficients=(0.0,) * L + (1.0,),
                  bilateral=None, bilateral_scaling=False,
                  soft_threshold=True, preserve_variance=False,
                  gamma=3.2, gamma_min=None, gamma_max=None, h=0.0,
                  has_noise=False)
        f = jax.jit(lambda a, s=st: W.wow_core(a, zero, **s)[0])
        report(f"wow L{L}", f, wow_cost((n, n), L, B3SPLINE))

    print("\nNote: bounds assume v5e peaks (819 GB/s HBM); the tunneled "
          "platform's observed streaming ceiling is lower (~400 GB/s "
          "in-program), so fractions understate kernel quality — see "
          "DESIGN.md.", flush=True)


if __name__ == "__main__":
    main()
