#!/usr/bin/env python
"""Training-throughput accounting (VERDICT r2, Weak #4): a batch-size
scaling curve for the fused-epoch 2D train step, attributing the gap between
training patches/s and the inference headline.

The reference recipe pins batch 10-12 (using_unet.ipynb); round 2 reported
302 patches/s at batch 12 without showing whether that batch UNDERFILLS the
MXU.  This sweep measures the same fused on-device epoch at batch 12 → 192
(dataset size fixed, divisible by every batch), plus an fp32 ablation at the
best batch, and writes TRAIN_SCALING.json for benchmarks/NOTES.md.

Run alone on the TPU (never concurrently with pytest on this 1-core host).
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N, DIM, NF = 960, 256, 32
BATCHES = [12, 24, 48, 96, 192]
OUT = os.path.join(ROOT, "benchmarks", "TRAIN_SCALING.json")


def make_trainer(bs, half):
    from bio_image_unet_tpu.train import Trainer

    rng = np.random.default_rng(0)
    imgs = rng.random((N, DIM, DIM, 1)).astype(np.float32)
    masks = (rng.random((N, DIM, DIM, 1)) > 0.5).astype(np.float32)

    class SynthDataset:
        dim_out = (DIM, DIM)

        def __len__(self):
            return N

        def __getitem__(self, i):
            return {"image": imgs[i], "mask": masks[i]}

    return Trainer(SynthDataset(), num_epochs=1, network="Unet", batch_size=bs,
                   n_filter=NF, lr=1e-4, val_split=0.0, device_cache=True,
                   half_precision=half, save_dir=f"/tmp/train_scaling_{bs}_{half}",
                   seed=0)


def measure(bs, half=True, repeats=3):
    tr = make_trainer(bs, half)
    tr._iterate_train(0)  # compile
    best = float("inf")
    for e in range(repeats):
        t0 = time.perf_counter()
        tr._iterate_train(1 + e)
        best = min(best, time.perf_counter() - t0)
    steps = tr._n_train // bs
    return steps * bs / best


def main():
    results = {"config": f"Unet nf{NF} {DIM}^2, fused epoch, {N}-patch "
                         "HBM-resident dataset, best of 3 epochs",
               "bf16_curve": {}, "fp32_at_best": None}
    for bs in BATCHES:
        pps = measure(bs, half=True)
        results["bf16_curve"][str(bs)] = round(pps, 1)
        print(json.dumps({"batch_size": bs, "half_precision": True,
                          "patches_per_s": round(pps, 1),
                          "fwd_equiv_mpix_per_s": round(pps * DIM * DIM / 1e6, 1)}))
    best_bs = max(results["bf16_curve"], key=lambda k: results["bf16_curve"][k])
    pps32 = measure(int(best_bs), half=False)
    results["fp32_at_best"] = {"batch_size": int(best_bs),
                               "patches_per_s": round(pps32, 1)}
    print(json.dumps({"batch_size": int(best_bs), "half_precision": False,
                      "patches_per_s": round(pps32, 1)}))
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
