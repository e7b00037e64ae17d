#!/usr/bin/env python
"""End-to-end demo: synthesize a noisy multi-scale scene, enhance it
with WOW, denoise it, and deconvolve a blurred copy with Richardson-Lucy.

Writes raw float32 images next to this script (view with
``np.fromfile(..., np.float32).reshape(N, N)``), and prints per-stage
timings and simple quality metrics.

Run: python examples/enhance_demo.py [N]    (default N=1024)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import wavelets_tpu as wt
from wavelets_tpu.utils import write_array
from wavelets_tpu.utils.profiling import StageTimer


def make_scene(n, rng):
    """Faint small-scale structure over bright large-scale gradients —
    the regime WOW is built for (solar EUV-like)."""
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
    scene = 200 * np.exp(-((xx - n / 2) ** 2 + (yy - n / 2) ** 2)
                         / (0.18 * n * n))
    for _ in range(60):  # faint loops / threads at small scales
        x0, y0 = rng.uniform(0, n, 2)
        sx, sy = rng.uniform(2, 10, 2)
        amp = rng.uniform(0.5, 3.0)
        scene += amp * np.exp(-(((xx - x0) / sx) ** 2
                                + ((yy - y0) / sy) ** 2))
    return scene


def psnr(clean, test):
    mse = float(np.mean((clean - test) ** 2))
    return 10 * np.log10(float(clean.max()) ** 2 / mse)


OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def _out(name):
    return os.path.join(OUT_DIR, name)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rng = np.random.default_rng(0)
    scene = make_scene(n, rng)
    noisy = (scene + rng.normal(scale=1.0, size=scene.shape)
             ).astype(np.float32)
    write_array(_out("scene_noisy.f32"), noisy)

    timer = StageTimer()

    with timer.stage("wow") as box:
        enhanced, _ = wt.wow(noisy, denoise_coefficients=[5, 2],
                             bilateral=1)
        box["out"] = enhanced
    write_array(_out("scene_wow.f32"), np.asarray(enhanced))

    with timer.stage("denoise") as box:
        clean = wt.denoise(noisy, [5, 3, 2])
        box["out"] = clean
    write_array(_out("scene_denoised.f32"), np.asarray(clean))
    print(f"denoise PSNR: noisy {psnr(scene, noisy):.1f} dB -> "
          f"{psnr(scene, np.asarray(clean, dtype=np.float64)):.1f} dB")

    # blur + deconvolve
    k = np.arange(9) - 4
    psf = np.exp(-(k[:, None] ** 2 + k[None, :] ** 2) / 6.0)
    psf = (psf / psf.sum()).astype(np.float32)
    import jax.numpy as jnp
    from jax import lax

    # deconvolution demo works from a lightly-noisy blur of the clean
    # scene (RL amplifies heavy noise; its regularization is tested in
    # tests/test_golden_extra.py)
    blurred = np.asarray(lax.conv_general_dilated(
        jnp.asarray(scene.astype(np.float32))[None, None],
        jnp.asarray(psf)[None, None],
        (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0])
    blurred = blurred + rng.normal(scale=0.05, size=blurred.shape
                                   ).astype(np.float32)
    with timer.stage("richardson_lucy") as box:
        sharp = wt.richardson_lucy(blurred, psf, iterations=3, fft=True)
        box["out"] = sharp
    write_array(_out("scene_deconvolved.f32"), np.asarray(sharp))
    # (RL quality/parity is covered by the golden tests; whole-frame MSE
    # is not a meaningful metric for deconvolution of smooth scenes)

    print(timer.report())


if __name__ == "__main__":
    main()
