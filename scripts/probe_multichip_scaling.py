"""Record the virtual-mesh scaling SHAPE of the multichip train step:
per-device shard sizes and collective inventories at 2/4/8 devices
(MULTICHIP_SCALING.json).

No real multi-chip hardware exists in this environment, so wall-clock
"speedup" on virtual CPU devices would be fiction; what IS checkable —
and is the evidence a real mesh run would need anyway — is that the
partitioned programs (a) shard the declared axes (per-device buffer
bytes shrink with the mesh), and (b) carry exactly the expected
communication pattern (sp reductions present, dp collective-free).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python scripts/probe_multichip_scaling.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from pgdrome_tpu.parallel.enrich import dryrun

    out = {"devices": []}
    for n in (2, 4, 8):
        info = dryrun(n, devices=jax.devices("cpu")[:n],
                      check_collectives=True)
        out["devices"].append({
            "n_devices": n,
            "mesh": info["mesh"],
            "collectives": info["collectives"],
            "shardings": info["shardings"],
        })
        print(f"n={n}: mesh {info['mesh']} collectives "
              f"{info['collectives']} modes0 shards "
              f"{info['shardings']['modes0']['shards']}", flush=True)
    # bench-like shapes at the full mesh
    _, sp = 4, 2
    info = dryrun(8, devices=jax.devices("cpu")[:8],
                  n_x=1024 * sp - 1, n_p=64, num_params=3, B=8,
                  check_collectives=True)
    out["bench_like"] = {
        "mesh": info["mesh"], "B": info["B"], "n0": info["n0"],
        "collectives": info["collectives"],
        "shardings": info["shardings"],
    }
    print(f"bench-like: n0={info['n0']} B={info['B']} "
          f"collectives {info['collectives']}", flush=True)
    with open("MULTICHIP_SCALING.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
