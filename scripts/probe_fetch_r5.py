#!/usr/bin/env python
"""Why didn't the bf16 corpus drain help? (results/gen_bench_r5.json:
ls 17.15 vs ls_bf16fetch 16.41 pkts/s.) This probe times BARE
device→host transfers of the same payload at f32 vs bf16 to separate
link bandwidth from per-transfer overhead / host-side conversion.

Writes results/probe_fetch_r5.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"[probe] device {jax.devices()[0]}", flush=True)

    out = {"device": str(jax.devices()[0]), "transfers": {}}
    key = jax.random.PRNGKey(0)
    for mb, n in ((8, 4), (64, 3)):
        elems = mb * (1 << 20) // 4
        x32 = jax.random.normal(key, (elems,), jnp.float32)
        x16 = jax.jit(lambda a: a.astype(jnp.bfloat16))(x32)
        jax.block_until_ready((x32, x16))
        rows = {}
        for name, arr in (("f32", x32), ("bf16", x16)):
            np.asarray(arr)                      # warm path
            t0 = time.perf_counter()
            for _ in range(n):
                h = np.asarray(arr)
            dt = (time.perf_counter() - t0) / n
            payload = arr.size * arr.dtype.itemsize / (1 << 20)
            rows[name] = {"s_per_fetch": round(dt, 3),
                          "payload_mib": payload,
                          "mib_per_s": round(payload / dt, 1)}
            print(f"[probe] {mb} MiB logical, {name}: {dt:.3f} s "
                  f"({payload / dt:.1f} MiB/s wire)", flush=True)
            del h
        # bf16 + host upcast (what fetch_tree does)
        t0 = time.perf_counter()
        for _ in range(n):
            h = np.asarray(x16).astype(np.float32)
        dt = (time.perf_counter() - t0) / n
        rows["bf16_upcast"] = {"s_per_fetch": round(dt, 3)}
        print(f"[probe] {mb} MiB logical, bf16+upcast: {dt:.3f} s",
              flush=True)
        out["transfers"][f"{mb}MiB"] = rows
    with open("results/probe_fetch_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print("[probe] wrote results/probe_fetch_r5.json", flush=True)


if __name__ == "__main__":
    main()
