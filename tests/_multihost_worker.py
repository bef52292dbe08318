"""Worker process for the 2-process multi-host smoke (test_multihost.py).

Each process owns 2 virtual CPU devices (XLA_FLAGS set by the parent), so
the run is a real 2-process x 2-device = 4-device data-parallel job over
the jax.distributed coordinator: global batch sharded over hosts, params
replicated, one grad step whose collectives cross the process boundary,
then a checkpoint save/restore on process 0 (SURVEY §5.8 / §5.3-5.4).

Usage: python tests/_multihost_worker.py <pid> <nproc> <port> <tmpdir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    pid, nproc, port, tmpdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")

    from ditto_tts_tpu.parallel.mesh import initialize_multihost
    initialize_multihost(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()

    import jax.numpy as jnp
    from jax.experimental import multihost_utils as mu
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 2 * nproc, devs  # 2 local per process
    mesh = Mesh(np.array(devs).reshape(2 * nproc, 1), ("data", "model"))

    # global batch: 8 rows, each process contributes its local half
    full = np.arange(32, dtype=np.float32).reshape(8, 4) / 10.0
    local = full[pid * 4:(pid + 1) * 4]
    batch = mu.host_local_array_to_global_array(local, mesh, P("data"))
    params = mu.host_local_array_to_global_array(
        {"w": np.ones((4,), np.float32)}, mesh, P())

    @jax.jit
    def step(params, batch):
        def loss(p):
            pred = batch @ p["w"]
            return jnp.mean(pred ** 2)
        l, g = jax.value_and_grad(loss)(params)
        new = jax.tree_util.tree_map(lambda p, gr: p - 0.1 * gr, params, g)
        return l, new

    loss, new_params = step(params, batch)
    got = float(loss)  # replicated scalar is fully addressable

    # the loss must be over the GLOBAL batch (cross-process reduction):
    want = float(np.mean((full @ np.ones(4)) ** 2))
    local_only = float(np.mean((local @ np.ones(4)) ** 2))
    assert abs(got - want) < 1e-5, (got, want)
    assert abs(got - local_only) > 1e-3, "loss ignored the other host's data"

    # checkpoint save/restore on process 0 of the replicated state
    from ditto_tts_tpu.train.checkpoint import restore_into, save_checkpoint
    state = {"params": jax.tree_util.tree_map(np.asarray, new_params),
             "step": np.asarray(1)}
    path = os.path.join(tmpdir, "mh_ck.npz")
    if pid == 0:
        save_checkpoint(path, state)
    mu.sync_global_devices("checkpoint_saved")
    if pid == 0:
        restored = restore_into(state, path)
        np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                      np.asarray(state["params"]["w"]))
    mu.sync_global_devices("checkpoint_restored")

    # SHARDED save: a state whose leaves are sharded ACROSS the process
    # boundary (not fully addressable on either host) — save_checkpoint is
    # collective (both processes call it), gathers the global value, and
    # only process 0 writes; restore re-places onto the mesh and every
    # shard must equal the original (VERDICT r03 missing #4).
    global_w = np.arange(8, dtype=np.float32).reshape(8, 1)
    sharded = {"w": mu.host_local_array_to_global_array(
        global_w[pid * 4:(pid + 1) * 4], mesh, P("data"))}
    assert not sharded["w"].is_fully_addressable
    spath = os.path.join(tmpdir, "mh_sharded_ck.npz")
    save_checkpoint(spath, {"params": sharded, "step": np.asarray(2)})
    mu.sync_global_devices("sharded_saved")
    # restore on BOTH processes from the host template, shard back out
    tmpl = {"params": {"w": np.zeros((8, 1), np.float32)},
            "step": np.asarray(0)}
    restored = restore_into(tmpl, spath)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  global_w)
    assert int(restored["step"]) == 2
    re_sharded = jax.device_put(
        restored["params"]["w"], NamedSharding(mesh, P("data")))
    # every local shard of the re-placed array matches the source rows
    for s in re_sharded.addressable_shards:
        np.testing.assert_array_equal(np.asarray(s.data),
                                      global_w[s.index])
    mu.sync_global_devices("sharded_restored")

    print(f"MULTIHOST_OK pid={pid} loss={got:.6f}", flush=True)


if __name__ == "__main__":
    main()
