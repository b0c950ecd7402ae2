"""Ring-CRPS: ensemble CRPS with one member per data-parallel device.

TPU-native re-design of the reference's ring-shift CRPS (reference:
credit/losses/crps.py:17 ring_crps_loss / :76 RingCRPSLoss — one ensemble
member per dp rank, K-1 P2P shifts, O(1) memory, gradient-correct without
cross-rank backward): the NCCL isend/irecv ring becomes lax.ppermute inside
shard_map, and jax's ppermute transpose rule gives the correct backward
automatically (gradients flow only through the local member, matching the
reference's stop-gradient on received members).

CRPS estimator (fair, Zamo & Naveau): for member x_i of m members,
  skill_i  = |x_i - y|
  spread_i = (1/(m-1)) sum_{j != i} |x_i - x_j|   (each pair counted once
             across the ring by halving)
  crps     = mean_i skill_i - 0.5 * mean_i spread_i
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def ring_crps(member: jnp.ndarray, target: jnp.ndarray,
              axis_name: str = "dp") -> jnp.ndarray:
    """Per-device: local ensemble member (field) + shared target -> scalar
    fair-CRPS mean over the field, averaged over the ring axis.

    Call inside shard_map/pjit with `member` sharded over `axis_name` (one
    member per device) and `target` replicated along it.
    """
    m = lax.axis_size(axis_name)
    skill = jnp.abs(member - target).mean()

    # ring reduction of pairwise |x_i - x_j|: shift a buffer around the ring
    # m-1 times; received members are constants wrt the local graph (ppermute
    # transpose routes their grads back to the owner, which is exactly the
    # reference's "gradient-correct without cross-rank backward").
    perm = [(i, (i + 1) % m) for i in range(m)]

    def body(k, carry):
        buf, acc = carry
        buf = lax.ppermute(buf, axis_name, perm)
        acc = acc + jnp.abs(member - buf).mean()
        return buf, acc

    # acc starts device-varying over the ring axis (shard_map vma typing)
    if hasattr(lax, "pcast"):
        acc0 = lax.pcast(jnp.zeros((), member.dtype), axis_name, to="varying")
    else:  # older jax
        acc0 = lax.pvary(jnp.zeros((), member.dtype), (axis_name,))
    _, pair_sum = lax.fori_loop(0, m - 1, body, (member, acc0))
    spread_i = pair_sum / jnp.maximum(m - 1, 1)
    crps_i = skill - 0.5 * spread_i
    return lax.pmean(crps_i, axis_name)


def make_ring_crps_loss(mesh, axis_name: str = "dp"):
    """Wrap ring_crps for use from outside shard_map: takes
    members (m, ...) and target (...) on host/global arrays."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    @jax.jit
    def loss(members, target):
        def inner(mem, tgt):
            return ring_crps(mem[0], tgt, axis_name)[None]

        out = shard_map(
            inner, mesh=mesh,
            in_specs=(P(axis_name), P()),
            out_specs=P(axis_name),
        )(members, target)
        return out.mean()

    return loss


def dense_fair_crps(members: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Reference implementation for parity tests (dense O(m^2) fair CRPS,
    the check used by reference tests/test_ring_crps.py)."""
    m = members.shape[0]
    skill = jnp.abs(members - target[None]).mean()
    diffs = jnp.abs(members[:, None] - members[None, :]).mean(
        axis=tuple(range(2, members.ndim + 1)))
    spread = diffs.sum() / (m * (m - 1))
    return skill - 0.5 * spread
