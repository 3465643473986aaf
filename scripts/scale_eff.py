#!/usr/bin/env python
"""Scale-out efficiency of the sharded overlap path (VERDICT r4 task 7).

Fixed work (one simulated bank), wall-clock with 1 vs N virtual CPU
devices on the (rd x idx) mesh.  CPU devices share the same cores, so
this measures the SHARDING OVERHEAD (collectives + per-shard staging),
not true speedup — efficiency = t1 / (tN) with equal totals means the
mesh program costs no more than the single-device program; on real
chips the same program rides ICI (parallel/sharded.py collectives).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python scripts/scale_eff.py
Writes work/scale_eff.json.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from smartdenovo_tpu.data.readbank import ReadBank
    from smartdenovo_tpu.parallel.sharded import (make_overlap_mesh,
                                                  overlap_sharded)
    from smartdenovo_tpu.pipeline.zmo import ZmoParams
    from smartdenovo_tpu.utils.simulate import random_genome, simulate_reads

    rng = np.random.default_rng(77)
    genome = random_genome(rng, 60_000)
    names, seqs = simulate_reads(genome, coverage=8, mean_len=4000, err=0.12,
                                 seed=78)
    from smartdenovo_tpu.pipeline.zmo import overlap_dmo

    rb = ReadBank(names, seqs)
    p = ZmoParams.dmo(batch_q=16)
    report = {"reads": len(rb), "bases": int(rb.total_bases)}
    pairs = {}
    # 1-device baseline = the single-chip pipeline (the program the mesh
    # version must not lose to); 8 devices = the sharded mesh program
    t0 = time.time()
    ovls = overlap_dmo(rb, p, progress=False)
    cold = time.time() - t0
    t0 = time.time()
    ovls = overlap_dmo(rb, p, progress=False)
    warm1 = time.time() - t0
    pairs[1] = {frozenset((o.rid1, o.rid2)) for o in ovls}
    report["single_chip"] = {"overlaps": len(ovls), "cold_s": round(cold, 1),
                             "warm_s": round(warm1, 1)}
    print(f"[scale] single-chip: {len(ovls)} overlaps, warm {warm1:.1f}s",
          flush=True)
    mesh = make_overlap_mesh(jax.devices())
    t0 = time.time()
    ovls = overlap_sharded(rb, p, mesh=mesh, progress=False)
    cold = time.time() - t0
    t0 = time.time()
    ovls = overlap_sharded(rb, p, mesh=mesh, progress=False)
    warm8 = time.time() - t0
    pairs[8] = {frozenset((o.rid1, o.rid2)) for o in ovls}
    report["mesh_8dev"] = {
        "shape": list(mesh.devices.shape), "overlaps": len(ovls),
        "cold_s": round(cold, 1), "warm_s": round(warm8, 1)}
    print(f"[scale] 8-dev mesh {mesh.devices.shape}: "
          f"{len(ovls)} overlaps, warm {warm8:.1f}s", flush=True)
    report["pairs_equal"] = pairs[1] == pairs[8]
    report["warm_ratio_single_over_mesh"] = round(warm1 / max(1e-9, warm8), 3)
    out = os.path.join(ROOT, "work", "scale_eff.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print("[scale] wrote", out, report["warm_ratio_single_over_mesh"],
          "pairs_equal", report["pairs_equal"])


if __name__ == "__main__":
    main()
