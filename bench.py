#!/usr/bin/env python
"""Repo-root bench entry point (the driver runs `python bench.py`).

The implementation lives in wavelets_tpu.bench so the installed console
script (`wavelets-tpu bench`) works outside the repo checkout too."""

from wavelets_tpu.bench import main

if __name__ == "__main__":
    main()
