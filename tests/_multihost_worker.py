"""Worker for the REAL 2-process multi-host test (VERDICT r2 item 6).

Launched twice by ``tests/test_multihost.py`` with
``jax.distributed.initialize`` over localhost (Gloo CPU collectives, 4
virtual devices per process → 8 global). Each process drives the
production input path — ``parallel.mesh.put_sharded`` under a REAL
``jax.process_count() == 2`` — and one jitted DP train step (loss + grads
+ fused AdamW update) on the global 8-device mesh. Process 0 writes the
loss and a parameter checksum for the parent to compare with its own
single-process 8-device run.

Run: python tests/_multihost_worker.py <process_id> <port> <out_json>
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, "not actually multi-process"
assert jax.device_count() == 8 and jax.local_device_count() == 4

import numpy as np  # noqa: E402

from multimodal_mtrssm_tpu.parallel.mesh import (  # noqa: E402
    batch_sharding,
    make_mesh,
    put_sharded,
)
from tests._multihost_common import build_problem  # noqa: E402

model, params, opt, batch_np, key = build_problem()
mesh = make_mesh()
bsh = batch_sharding(mesh)

# The production input path: every host holds the full (tiny) arrays and
# contributes only its addressable shards (make_array_from_callback branch).
batch = tuple(put_sharded(x, bsh) for x in batch_np)
for b in batch:
    assert len(b.addressable_shards) == 4  # only local devices materialized

# Params replicated across both processes.
from jax.sharding import NamedSharding, PartitionSpec  # noqa: E402

rep = NamedSharding(mesh, PartitionSpec())
params = jax.tree.map(
    lambda x: jax.make_array_from_callback(np.shape(x), rep, lambda idx: np.asarray(x)[idx]),
    params,
)
opt_state = jax.tree.map(
    lambda x: jax.make_array_from_callback(np.shape(x), rep, lambda idx: np.asarray(x)[idx]),
    opt.init(jax.device_get(params)),
)


def train_step(p, s, b, k):
    def loss_fn(pp):
        return model.shared_step(pp, b, k)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(p)
    updates, s = opt.update(grads, s, p)
    return jax.tree.map(lambda a, u: a + u, p, updates), s, loss


params, opt_state, loss = jax.jit(train_step)(params, opt_state, batch, key)
# Fully-replicated outputs are addressable everywhere; grab scalars.
loss = float(loss)
checksum = float(sum(float(jax.numpy.sum(jax.numpy.abs(x))) for x in jax.tree.leaves(params)))
if pid == 0:
    Path(out_path).write_text(json.dumps({"loss": loss, "param_checksum": checksum}))
print(f"worker {pid}: loss={loss:.6f} checksum={checksum:.4f}", flush=True)
