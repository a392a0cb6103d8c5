"""Worker for test_multiprocess.py: one rank of a 2-process JAX cluster.

Exercises the multi-host path of :mod:`rald_tpu.parallel.mesh` — the TPU
analog of the reference's torchrun/NCCL launch (misc.py:214-246): env-var
discovery -> jax.distributed.initialize -> global mesh ->
make_array_from_process_local_data -> one psum'd sharded step.

Then the two known-risky multi-host surfaces beyond the step itself
(VERDICT r3 "Next round" #4):

- **sharded checkpoint save + restart-style restore** (reference
  misc.py:293-365): a real TrainState (params + EMA + AdamW opt-state) is
  saved through :class:`rald_tpu.train.checkpoint.CheckpointManager` with
  BOTH processes participating (orbax multi-host coordination), then
  restored into a freshly-built mesh and zero-initialized state — the
  restore path that DESIGN.md §6 documents as capable of surfacing
  rendezvous timeouts — and checked for exact equality on every rank.
- **distributed eval** (reference main_ae.py:64-70 DistributedSampler +
  misc.py:39-50 metric all_reduce): a ShardedSampler splits the frame
  index set across ranks, each rank scores only its shard, and the metric
  is psum-reduced in-graph over the global mesh; both ranks must end with
  the global mean.

Run via: python tests/_mp_worker.py  (env: MASTER_ADDR, MASTER_PORT,
WORLD_SIZE, RANK, MP_CKPT_DIR set by the test).
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

    checkpoint_roundtrip(mesh, rank)
    distributed_eval(mesh, rank)


def checkpoint_roundtrip(mesh, rank):
    """Sharded orbax save from both processes, restore into a FRESH mesh."""
    from rald_tpu.train.checkpoint import CheckpointManager
    from rald_tpu.train.state import create_train_state

    ckpt_dir = os.environ["MP_CKPT_DIR"]

    params = {
        "w": jax.device_put(
            jnp.arange(8, dtype=jnp.float32).reshape(2, 4), replicated(mesh)
        ),
        "b": jax.device_put(jnp.ones((4,), jnp.float32), replicated(mesh)),
    }
    state = create_train_state(params, 1e-2, clip_grad=1.0)
    # one real update so EMA != params and the AdamW moments are non-zero
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 0.1), state.params
    )
    state = jax.jit(lambda s: s.apply_gradients(grads, 0.9))(state)

    mgr = CheckpointManager(ckpt_dir)
    mgr.save(state, epoch=7)

    # restart-style restore: fresh mesh + zero-initialized state of the same
    # structure (the donated-EMA-alias failure mode of DESIGN.md §6 shows up
    # exactly here, as a cross-process rendezvous timeout)
    mesh2 = make_mesh()
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    fresh = create_train_state(
        jax.device_put(zeros, replicated(mesh2)), 1e-2, clip_grad=1.0
    )
    restored, epoch = CheckpointManager(ckpt_dir).restore(fresh, 7)
    assert epoch == 7, epoch

    for name, want, got in (
        ("params", state.params, restored.params),
        ("ema_params", state.ema_params, restored.ema_params),
        ("opt_state", state.opt_state, restored.opt_state),
    ):
        jax.tree_util.tree_map(
            lambda w, g: np.testing.assert_array_equal(
                np.asarray(jax.device_get(w)), np.asarray(jax.device_get(g))
            ),
            want,
            got,
        )
    assert int(restored.step) == 1
    print(f"MP_CKPT_OK rank={rank} epoch={epoch}", flush=True)


def distributed_eval(mesh, rank):
    """ShardedSampler split + in-graph psum metric reduction: both ranks
    score disjoint halves of the frame set yet report the global mean."""
    from jax.sharding import PartitionSpec as P

    from rald_tpu.data.loader import ShardedSampler

    n_frames = 6
    frames = np.arange(n_frames, dtype=np.float32).reshape(n_frames, 1) + 1.0

    sampler = ShardedSampler(
        n_frames, num_replicas=2, rank=rank, shuffle=False, drop_last=True
    )
    local_idx = list(iter(sampler))
    assert len(local_idx) == 3, local_idx
    # disjoint coverage: interleaved rank slices of the unshuffled sequence
    assert local_idx == list(range(rank, n_frames, 2)), local_idx

    local = frames[local_idx]  # (3, 1) per rank -> (6, 1) global
    batch = shard_batch({"x": local}, mesh)

    @jax.jit
    def metric(x):
        return jnp.mean(x)  # mean over the GLOBAL sharded batch (psum'd)

    got = float(metric(batch["x"]))
    np.testing.assert_allclose(got, float(frames.mean()), rtol=1e-6)
    print(f"MP_EVAL_OK rank={rank} metric={got:.4f}", flush=True)


if __name__ == "__main__":
    main()
