"""Subprocess body for the 2-process DCN test (see test_multihost.py).

Run as: python tests/multihost_worker.py <coordinator> <nproc> <pid> <out>
Environment must preset JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count (jax may already be imported by a
sitecustomize at interpreter startup)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, nproc, pid, out = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    import jax

    jax.config.update("jax_platforms", "cpu")
    # distributed init MUST precede the first backend touch; package
    # modules create jnp constants at import time, so initialize before
    # importing smartdenovo_tpu
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nproc, process_id=pid)
    import numpy as np

    from smartdenovo_tpu.data.readbank import ReadBank
    from smartdenovo_tpu.parallel.multihost import (make_dcn_mesh,
                                                    overlap_multihost)
    from smartdenovo_tpu.pipeline.zmo import ZmoParams
    from smartdenovo_tpu.utils.simulate import random_genome, simulate_reads
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc * jax.local_device_count()

    rng = np.random.default_rng(77)
    genome = random_genome(rng, 60_000)
    names, seqs = simulate_reads(genome, coverage=8, mean_len=4000, err=0.12,
                                 seed=78)
    rb = ReadBank(names, seqs)
    mesh = make_dcn_mesh(n_idx=nproc)
    ovls = overlap_multihost(rb, ZmoParams.dmo(ncand=64, batch_q=16),
                             mesh=mesh, progress=False)
    with open(out, "w") as fh:
        for o in sorted((min(o.rid1, o.rid2), max(o.rid1, o.rid2))
                        for o in ovls):
            fh.write(f"{o[0]}\t{o[1]}\n")
    print(f"process {pid}: {len(ovls)} overlaps", flush=True)


if __name__ == "__main__":
    main()
