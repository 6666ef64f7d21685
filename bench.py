"""Benchmark: flagship joint reg+strain+LMA training-step throughput.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

* value: cine slices/sec/chip of the full jitted train step (fwd + 3 losses +
  bwd + 2 optimizer updates) at reference-scale shapes (128x128 masks, T=20
  frames -> 19 Lagrangian pairs, 126x40 strain, batch 10 — reference
  configs/config.json defaults).
* vs_baseline: ratio to a measured PyTorch implementation of the same step
  (same shapes/semantics) on this container's torch device (CPU here; the
  reference targeted one CUDA GPU; see bench_baseline_torch.py). The torch
  number is cached in bench_baseline.json after first measurement.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BATCH = 10
H = W = 128
T_FRAMES = 20
T_STRAIN = 40
N_SECTORS = 126
# enough warmup/steps that the tunneled-platform variance stays ~<5%
WARMUP = 5
STEPS = 30
BASELINE_CACHE = REPO / "bench_baseline.json"


def _measure_cardiax(batch: int = BATCH) -> float:
    import jax
    from cardiax.models import build_model
    from cardiax.parallel.mesh import get_mesh, shard_batch
    from cardiax.train import build_trainer

    import __graft_entry__ as ge
    cfg = ge._flagship_config(h=H, w=W, t_myo=T_FRAMES, t_strain=T_STRAIN,
                              n_sectors=N_SECTORS, batch=batch)
    cfg["networks"]["joint_register_strainmat"]["n_integration_steps"] = 5
    host_batch = ge._synthetic_batch(batch=batch, h=H, w=W, t_myo=T_FRAMES,
                                     t_strain=T_STRAIN, n_sectors=N_SECTORS)

    mesh = get_mesh()
    networks = {name: build_model(mc) for name, mc in cfg["networks"].items()}
    trainer = build_trainer(cfg["training"], None, cfg, mesh=mesh)
    trainer.setup(networks, host_batch, steps_per_epoch=1,
                  seed=cfg["training"]["seed"])

    arrays = shard_batch(host_batch, mesh)
    arrays = {k: v for k, v in arrays.items() if isinstance(v, jax.Array)}

    params, opt_states = trainer.params, trainer.opt_states
    for _ in range(WARMUP):
        params, opt_states, values = trainer._train_step(params, opt_states, arrays)
    # force a real device->host fetch: on the tunneled axon platform,
    # block_until_ready is NOT a reliable sync — float() is
    float(values["total_loss"])

    t0 = time.perf_counter()
    for _ in range(STEPS):
        params, opt_states, values = trainer._train_step(params, opt_states, arrays)
    loss = float(values["total_loss"])
    dt = (time.perf_counter() - t0) / STEPS
    assert loss == loss, "NaN loss in benchmark step"
    n_chips = jax.device_count()
    return batch / dt / n_chips


def _baseline_slices_per_sec() -> dict:
    if BASELINE_CACHE.exists():
        return json.loads(BASELINE_CACHE.read_text())
    from bench_baseline_torch import measure_torch_baseline
    import torch
    dev = "cuda" if torch.cuda.is_available() else "cpu"
    # CPU: measure at batch 2 and scale linearly to batch-normalized slices/sec
    sps = measure_torch_baseline(batch=2 if dev == "cpu" else BATCH,
                                 h=H, w=W, t_frames=T_FRAMES,
                                 t_strain=T_STRAIN, n_steps=2)
    out = {"slices_per_sec": sps, "device": dev,
           "note": "measured PyTorch implementation of the same joint step"}
    BASELINE_CACHE.write_text(json.dumps(out))
    return out


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=None, nargs="+",
                   help="batch size(s) to measure; default: the reference's "
                        "batch 10 (the driver-bench configuration). Multiple "
                        "values print one extra JSON line per batch — the "
                        "batch-scaling sweep (production operating point is "
                        "~batch 20/chip; VERDICT r2 #9).")
    args = p.parse_args(argv)
    batches = args.batch or [BATCH]

    try:
        base = _baseline_slices_per_sec()
    except Exception as e:  # baseline failure must not kill the bench
        base = {"error": str(e)}

    for i, b in enumerate(batches):
        value = _measure_cardiax(batch=b)
        vs = value / base["slices_per_sec"] if base.get("slices_per_sec") else None
        line = {
            "metric": "joint_reg_strain_LMA_train_slices_per_sec_per_chip",
            "value": round(value, 4),
            "unit": "slices/sec/chip",
            "vs_baseline": round(vs, 4) if vs is not None else None,
        }
        if b != BATCH:
            line["batch"] = b   # only sweep lines carry the extra key; the
            # default line stays exactly the driver's one-JSON-line contract
        print(json.dumps(line))


if __name__ == "__main__":
    main()
