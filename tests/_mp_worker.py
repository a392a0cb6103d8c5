"""Worker for test_multiprocess.py: one rank of a 2-process JAX cluster.

Exercises the multi-host path of :mod:`rald_tpu.parallel.mesh` — the TPU
analog of the reference's torchrun/NCCL launch (misc.py:214-246): env-var
discovery -> jax.distributed.initialize -> global mesh ->
make_array_from_process_local_data -> one psum'd sharded step.

Run via: python tests/_mp_worker.py  (env: MASTER_ADDR, MASTER_PORT,
WORLD_SIZE, RANK set by the test).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from rald_tpu.parallel.mesh import (
    data_sharding,
    init_distributed,
    make_mesh,
    replicated,
    shard_batch,
)


def main():
    info = init_distributed()
    rank = info["rank"]
    assert info["world_size"] == 2, info
    assert info["global_device_count"] == 2, info
    assert info["is_main_process"] == (rank == 0), info

    mesh = make_mesh()  # 1-D 'data' mesh over both processes' devices

    # each process contributes its LOCAL half of the global batch
    local = np.full((1, 4), float(rank + 1), dtype=np.float32)
    batch = shard_batch({"x": local}, mesh)
    x = batch["x"]
    assert x.shape == (2, 4), x.shape  # global shape

    params = jax.device_put(jnp.full((4,), 0.5), replicated(mesh))

    @jax.jit
    def step(params, x):
        # data-parallel grad step: per-shard loss, XLA inserts the psum
        loss = jnp.mean((x * params) ** 2)
        grad = jax.grad(lambda p: jnp.mean((x * p) ** 2))(params)
        return loss, params - 0.1 * grad

    loss, new_params = step(params, x)
    # global mean over rows [1,1,1,1] and [2,2,2,2] scaled by 0.5:
    # mean(0.25*[1..1, 4..4]) = (0.25 + 1.0)/2
    np.testing.assert_allclose(float(loss), 0.625, rtol=1e-6)
    got = np.asarray(jax.device_get(new_params))
    # d/dp mean((x*p)^2) = mean(2*x^2*p) per element = 2*p*mean_col(x^2)
    expect = 0.5 - 0.1 * (2 * 0.5 * np.mean([1.0, 4.0]) / 4.0)
    np.testing.assert_allclose(got, np.full((4,), expect), rtol=1e-6)
    print(f"MP_OK rank={rank} loss={float(loss):.4f}", flush=True)


if __name__ == "__main__":
    main()
