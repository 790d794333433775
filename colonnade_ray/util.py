"""Small shared helpers (no Ray session ownership here — see
__ray_entry__ contract)."""

from __future__ import annotations


def default_concurrency(headroom: int = 2, floor: int = 1) -> int:
    """Actor-pool size: node CPUs minus headroom for I/O stages."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(floor, cpus - headroom)
