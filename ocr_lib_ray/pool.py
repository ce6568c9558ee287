"""Actor-pool sizing that tracks the cluster.

A fixed ``concurrency=(1, 4)`` caps a stateful stage at 4 actors no
matter how many nodes the job runs on — correct on a laptop, a 8× waste
on a 32-core box and a scale bug on a 256-node cluster.  Stages default
to these autoscaling bounds instead; callers with a measured reason
(e.g. a giant-page pool deliberately kept small) still pass explicit
bounds.
"""

from __future__ import annotations


def autoscale_pool(lo: int = 1, cap: int | None = None) -> tuple:
    """(lo, hi) actor-pool bounds with hi = cluster CPUs (min 2).

    ``cap`` bounds hi for stages that should never own the whole node.
    Reads cluster size at pipeline-build time; Ray's autoscaling pool
    only creates actors the backlog needs, so a generous hi costs
    nothing on small inputs.
    """
    import ray

    n = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    hi = max(2, n)
    if cap is not None:
        hi = min(hi, cap)
    return (lo, hi)
