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

    def one(pc1, pi1, sy1, sh1):
        e_c, e_i, conv, _it = _multi_circulant_bp(
            pc1[None], pi1[None], sy1[None], sh1, max_iter, method
        )
        return e_c[0], e_i[0], conv[0]

    def local(pc, pi, sy, sh):
        # vmap over the device-local instances: the decode work batches
        # across the vector lanes instead of serializing inside one program
        # (round-1 ran a sequential Python loop here; the early-exit
        # while_loop now runs to the max iteration count among local
        # instances, which the batching amortizes).
        return jax.vmap(one)(pc, pi, sy, sh)

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
