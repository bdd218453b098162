#!/usr/bin/env python
"""Round-5 UNet++ int8 decision probe (VERDICT r4 ask #5).

A/Bs the SCALE-FOLDED int8 formulation (predict/quant_nested.py round-5
rewrite: per-partner input scales folded into the consuming conv kernels at
calibration time → raw-int8 concats, same-scale upsample round-trip, no
per-cell full-resolution requant passes) against the bf16 fused heads
pipeline at the 512² decision shape — the same leg whose round-4
shared-concat-scale formulation measured 0.892× (`INT8_r04.json`).

Writes benchmarks/PROBE_NESTED_INT8.json either way; the ship rule stays
>= ~1.15× end-to-end (quant._MEASURED_INT8).

Run alone on the TPU (never concurrently with pytest on this 1-core host).
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OUT = os.path.join(ROOT, "benchmarks", "PROBE_NESTED_INT8.json")


def main():
    from int8_bench import bench_nested

    bf16, int8 = bench_nested()
    result = {
        "config": "nf32 4-level UNet++ fused heads pipeline, 512^2 patches, "
                  "device-resident, best-of-3 — round-5 scale-folded int8 "
                  "formulation vs bf16 (round-4 shared-concat-scale "
                  "formulation: 0.892x, INT8_r04.json)",
        "bf16_mpix_per_s": round(bf16, 1),
        "int8_mpix_per_s": round(int8, 1),
        "speedup": round(int8 / bf16, 3),
        "ship_rule": ">= ~1.15x end-to-end",
        "ships": int8 / bf16 >= 1.15,
    }
    print(json.dumps(result), flush=True)
    with open(OUT, "w") as fh:
        json.dump(result, fh, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
