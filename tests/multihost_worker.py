"""Worker process for tests/test_multihost.py — NOT collected by pytest.

Launched twice (process_id 0/1) to form a real 2-process ``jax.distributed``
runtime over CPU (4 virtual devices per process, gloo collectives), the
closest faithful stand-in for a 2-host TPU pod slice this single-chip build
host allows: the mesh's axes genuinely span process boundaries, so psum /
ppermute traffic crosses a real transport instead of staying in-process.

Validates the package's multi-host surface (parallel/mesh.py:22
``initialize_distributed``; SURVEY §2.8 row "multi-host") with three legs:

1. ``initialize_distributed`` + ``get_mesh()`` spanning all 8 global devices;
2. a data-parallel SGD step on ``models.Unet`` whose global batch is sharded
   across the processes — the grad psum rides gloo; both processes must end
   with bit-identical replicated params;
3. ``parallel.halo.spatial_shard_apply`` with the ``spatial`` axis spanning
   BOTH processes (1x8 mesh), checked against the unsharded zero-pad oracle
   computed locally.

Prints ``RESULT <json>`` on success; any assertion/exception exits non-zero.
"""

import json
import os
import sys

PROC_ID, N_PROC, PORT = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
LOCAL_DEVICES = 4

os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from bio_image_unet_tpu.parallel import initialize_distributed

initialize_distributed(coordinator_address=f"localhost:{PORT}",
                       num_processes=N_PROC, process_id=PROC_ID)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from bio_image_unet_tpu.parallel import data_sharding, get_mesh, replicated

assert len(jax.local_devices()) == LOCAL_DEVICES
assert len(jax.devices()) == N_PROC * LOCAL_DEVICES

out = {"n_global_devices": len(jax.devices())}

# --- leg 2: DP train step, batch sharded ACROSS processes ------------------
import optax

from bio_image_unet_tpu.losses import bce_dice_loss
from bio_image_unet_tpu.models import Unet

mesh = get_mesh()  # (data=8, spatial=1) over both processes
model = Unet(n_filter=4)
tx = optax.adam(1e-3)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
params, batch_stats = variables["params"], variables["batch_stats"]
opt_state = tx.init(params)
rep = replicated(mesh)
params, batch_stats, opt_state = (jax.device_put(params, rep),
                                  jax.device_put(batch_stats, rep),
                                  jax.device_put(opt_state, rep))

rng = np.random.default_rng(0)  # same seed on both processes
batch_x = rng.random((8, 32, 32, 1), np.float32)
batch_y = (rng.random((8, 32, 32, 1), np.float32) > 0.7).astype(np.float32)
shard = data_sharding(mesh, 4)
# each process contributes its addressable half of the global batch
x = jax.make_array_from_process_local_data(shard, batch_x[PROC_ID * 4:(PROC_ID + 1) * 4])
y = jax.make_array_from_process_local_data(shard, batch_y[PROC_ID * 4:(PROC_ID + 1) * 4])


@jax.jit
def train_step(params, batch_stats, opt_state, xb, yb, dropout_rng):
    """The dryrun/Trainer DP step (forward + loss + backward + Adam +
    BatchNorm update): the grad all-reduce XLA inserts for the replicated
    out-shardings is the collective that must ride gloo here."""

    def loss_fn(p):
        out_, mutated = model.apply(
            {"params": p, "batch_stats": batch_stats}, xb, train=True,
            mutable=["batch_stats"], rngs={"dropout": dropout_rng})
        _, logits = out_
        return bce_dice_loss(logits, yb, 0.5, 0.5), mutated

    (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, mutated["batch_stats"], opt_state, loss


params, batch_stats, opt_state, loss = train_step(
    params, batch_stats, opt_state, x, y, jax.random.PRNGKey(1))
out["loss"] = float(loss)  # replicated scalar — addressable everywhere
leaves = jax.tree_util.tree_leaves(params)
out["param_checksum"] = float(sum(float(jnp.sum(jnp.abs(l))) for l in leaves))

# --- leg 3: halo exchange across the process boundary ----------------------
from jax import lax

from bio_image_unet_tpu.parallel.halo import spatial_shard_apply

mesh_sp = get_mesh(n_data=1, n_spatial=8)
kern = jnp.asarray(rng.standard_normal((3, 3, 1, 1)), jnp.float32)


def conv(t):
    return lax.conv_general_dilated(
        t, kern, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


img = np.asarray(rng.standard_normal((1, 64, 32, 1)), np.float32)
spec = P(None, "spatial", None, None)
g_img = jax.make_array_from_process_local_data(
    NamedSharding(mesh_sp, spec), img[:, PROC_ID * 32:(PROC_ID + 1) * 32])
sharded_out = spatial_shard_apply(conv, g_img, mesh_sp, halo=1)

# oracle on the local default device: zero-pad by halo, conv, crop — the
# documented exact semantics of spatial_shard_apply
pad = jnp.pad(jnp.asarray(img), ((0, 0), (1, 1), (0, 0), (0, 0)))
oracle = np.asarray(conv(pad))[:, 1:-1]
g_oracle = jax.make_array_from_process_local_data(
    NamedSharding(mesh_sp, P()), jnp.asarray(oracle))
err = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)),
              out_shardings=NamedSharding(mesh_sp, P()))(sharded_out, g_oracle)
out["halo_err"] = float(err)
assert out["halo_err"] < 1e-5, out["halo_err"]

print("RESULT " + json.dumps(out), flush=True)
