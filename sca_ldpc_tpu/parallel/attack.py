"""Mesh-sharded multi-instance attack decoding.

Independent key-recovery attack instances are the data-parallel axis of the
flagship workload (SURVEY §2.3: the reference's process-level sweep).  The
masked full-circulant formulation (ops/circulant_bp._multi_circulant_bp)
makes instances shape-compatible by construction — circulant shifts are
data — so a batch of instances shards over the mesh with one compiled
program: each device decodes its local instances, statistics return
per-instance.
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.circulant_bp import _multi_circulant_bp


def make_sharded_masked_decode(mesh, max_iter=100, method="product_sum"):
    """Build a jitted sharded masked-circulant decode over the instance axis.

    Returns ``decode(prior_c [I,N], prior_i [I,P,N], syn [I,P,N],
    shifts [I,P,W]) -> (e_c [I,N], e_i [I,P,N], conv [I])`` with I sharded
    over every mesh axis.  I must be a multiple of the device count.
    """
    n_dev = mesh.devices.size
    spec = P(("data", "model"))

    def local(pc, pi, sy, sh):
        outs = [
            _multi_circulant_bp(
                pc[j : j + 1], pi[j : j + 1], sy[j : j + 1], sh[j],
                max_iter, method,
            )
            for j in range(pc.shape[0])
        ]
        e_c = jnp.concatenate([o[0] for o in outs], axis=0)
        e_i = jnp.concatenate([o[1] for o in outs], axis=0)
        conv = jnp.concatenate([o[2] for o in outs], axis=0)
        return e_c, e_i, conv

    def decode(prior_c, prior_i, syn, shifts):
        assert prior_c.shape[0] % n_dev == 0, (
            f"instance count {prior_c.shape[0]} not a multiple of {n_dev} devices"
        )
        sharded = jax.shard_map(
            local, mesh=mesh, in_specs=spec, out_specs=spec,
            check_vma=False,  # while_loop carries start unvarying
        )
        return sharded(prior_c, prior_i, syn, shifts)

    return jax.jit(decode)
