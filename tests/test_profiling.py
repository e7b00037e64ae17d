import jax.numpy as jnp
import numpy as np

from wavelets_tpu import B3SPLINE
from wavelets_tpu.core.transform import decompose
from wavelets_tpu.utils.profiling import (
    Cost,
    StageTimer,
    decompose_cost,
    roofline,
    wow_cost,
)


def test_cost_model():
    c = decompose_cost((1024, 1024), 6, B3SPLINE)
    assert c.flops > 0 and c.hbm_bytes > 1024 * 1024 * 4 * 7
    w = wow_cost((1024, 1024), 6, B3SPLINE, denoise=True)
    assert w.flops > c.flops and w.hbm_bytes > c.hbm_bytes
    total = c + w
    assert total.flops == c.flops + w.flops
    assert c.bound_ms() > 0


def test_stage_timer(rng):
    x = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))
    t = StageTimer()
    with t.stage("decompose") as box:
        box["out"] = decompose(x, 3, B3SPLINE)
    assert "decompose" in t.times
    assert t.times["decompose"][0] > 0
    assert "decompose" in t.report()


def test_roofline(rng):
    x = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    import jax

    f = jax.jit(lambda a: a * 2 + 1)
    r = roofline(f, (x,), Cost(flops=x.size * 2,
                               hbm_bytes=2 * x.size * 4), iters=3)
    assert r["measured_ms"] > 0
    assert r["achieved_gbps"] > 0
