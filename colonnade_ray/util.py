"""Small shared helpers (no Ray session ownership here — see
__ray_entry__ contract)."""

from __future__ import annotations


def default_concurrency(floor: int = 1) -> int:
    """Actor-pool size: ~3/4 of node CPUs, leaving proportional
    headroom for the read/shuffle/write stages.  Proportional (not
    CPUs-minus-constant) so that scaling runs at different CPU counts
    give every stage the same resource SHARE — constant headroom makes
    small-CPU runs under-provision the pool and distorts measured
    scaling efficiency."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(floor, (3 * cpus) // 4)
