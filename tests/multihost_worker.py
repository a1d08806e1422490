"""Worker for tests/test_multihost.py: one simulated host of a 2-process
jax.distributed CPU cluster.  Prints one JSON line with the cluster summary
and a cross-host psum result."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, n, i = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from smart_quantization_tpu.parallel.distributed import (
        init_multihost,
        is_primary,
    )

    summary = init_multihost(coordinator, n, i)
    summary["is_primary"] = is_primary()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    # one psum across hosts: shard a global array over every device in the
    # cluster and reduce it (DCN-path equivalent of the pod collective)
    mesh = jax.make_mesh((jax.device_count(),), ("data",))
    global_shape = (jax.device_count(), 4)
    local = np.full((jax.local_device_count(), 4), float(i + 1), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, global_shape
    )
    total = jax.jit(
        lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
    )(arr)
    summary["psum"] = float(jax.device_get(total))
    print("RESULT " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
