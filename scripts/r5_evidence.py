#!/usr/bin/env python
"""Round-5 evidence run: the shared per-config table
(wavelets_tpu/evidence.py — the same rows `python bench.py` emits),
written crash-safe to EVIDENCE_r05.json.

Usage: cd /root/repo && python scripts/r5_evidence.py
(TPU session; one TPU process at a time; ~15-25 min of compiles.)"""

import json
import sys

sys.path.insert(0, ".")

from wavelets_tpu.evidence import run_table


def main():
    results = {}

    def persist(key, entry):
        with open("EVIDENCE_r05.json", "w") as f:
            json.dump(results, f, indent=1)

    run_table(results=results, on_row=persist)
    with open("EVIDENCE_r05.json", "w") as f:
        json.dump(results, f, indent=1)
    print("WROTE EVIDENCE_r05.json", flush=True)


if __name__ == "__main__":
    main()
