import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

t0 = time.time()
while True:
    try:
        x = jnp.asarray(np.random.rand(256, 256).astype("float32"))
        float(np.asarray(x @ x).sum())
        print(f"[probe] ok after {time.time()-t0:.0f}s", flush=True)
        break
    except Exception as e:
        print(f"[probe] {type(e).__name__}: retry", flush=True)
        time.sleep(60)
    if time.time() - t0 > 1800:
        sys.exit(3)

from smartdenovo_tpu.pipeline.cns import (CnsParams, consensus_unitig,
                                          parse_lay_file, write_cns)
from smartdenovo_tpu.data.readbank import codes_to_seq
from smartdenovo_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
units = parse_lay_file("/root/repo/work/parity/ours.lay.all")
print(f"[cns] {len(units)} units", flush=True)
t0 = time.time()
res = []
for i, u in enumerate(units):
    cns = consensus_unitig(u, CnsParams(n_iter=6),
                           ckpt=f"/root/repo/work/parity/cns_ckpt_{i}.npz")
    if len(cns):
        res.append((u.name, cns))
wall = time.time() - t0
write_cns("/root/repo/work/parity/ours.cns.all", res)
tot = sum(len(c) for _, c in res)
print(f"[cns] DONE: {len(res)} contigs, {tot} bp in {wall:.0f}s", flush=True)
