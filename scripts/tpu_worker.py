#!/usr/bin/env python
"""Persistent TPU worker: keeps one live axon/TPU process and executes
python snippet files on request, so the multi-minute first-op stall of
this tunneled platform is paid once per session instead of once per
measurement.

Protocol: lines on the FIFO /tmp/tpuw_cmd name python files; each is
exec()'d in a persistent globals dict.  stdout goes to the worker log.
Send the line "quit" to exit cleanly (never kill the process — killing
mid-op wedges the device).
"""

import os
import sys
import time
import traceback

sys.path.insert(0, ".")

FIFO = "/tmp/tpuw_cmd"


def main():
    if os.path.exists(FIFO):
        os.remove(FIFO)
    os.mkfifo(FIFO)

    import jax
    import jax.numpy as jnp

    G = {"jax": jax, "jnp": jnp}
    # absorb the platform stall up front with a tiny op
    t0 = time.perf_counter()
    print("worker: warming up device...", flush=True)
    x = jnp.ones((256, 256), jnp.float32)
    float(jax.jit(jnp.sum)(x))
    print(f"worker: ready ({time.perf_counter() - t0:.1f}s warmup); "
          f"send snippet paths to {FIFO}", flush=True)

    while True:
        with open(FIFO) as f:
            for line in f:
                path = line.strip()
                if not path:
                    continue
                if path == "quit":
                    print("worker: bye", flush=True)
                    return
                print(f"worker: >>> {path}", flush=True)
                t0 = time.perf_counter()
                try:
                    # drop cached project modules so edits between
                    # snippets take effect (stale-module hazard)
                    for m in [m for m in sys.modules
                              if m.startswith("wavelets_tpu")]:
                        del sys.modules[m]
                    with open(path) as src:
                        code = src.read()
                    exec(compile(code, path, "exec"), G)
                    print(f"worker: <<< {path} ok "
                          f"({time.perf_counter() - t0:.1f}s)", flush=True)
                except Exception:
                    traceback.print_exc()
                    print(f"worker: <<< {path} FAILED", flush=True)


if __name__ == "__main__":
    main()
