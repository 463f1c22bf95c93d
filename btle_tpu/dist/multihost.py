"""Multi-host deployment of the sharded wideband scan.

BASELINE config 5 at N >= 2 hosts: each host ingests its own slice of the
wideband stream (its digitizer / its time-block range), the global mesh
spans all hosts' devices, and the same shard_map program runs with ICI
collectives inside a host and DCN across hosts (XLA picks the transport
from the mesh topology; the program is identical).

Usage on each host of a pod slice:

    from btle_tpu.dist.multihost import init_distributed, MultiHostWidebandScan
    init_distributed(coordinator="host0:1234", num_processes=N, process_id=k)
    scan = MultiHostWidebandScan(n_ch=4, block_wb=2_621_440)
    out = scan(local_i, local_q)     # this host's time shards only
    packets = scan.gather_packets(out)

Single-process environments (tests, one host) work identically —
``init_distributed`` is then a no-op and the local devices form the mesh.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from .shard import ShardedWidebandScan, make_mesh


def init_distributed(coordinator: str | None = None, num_processes: int = 1,
                     process_id: int = 0):
    """Bring up jax.distributed when running multi-process; no-op for 1."""
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_count(), jax.process_index()


class MultiHostWidebandScan(ShardedWidebandScan):
    """ShardedWidebandScan over the GLOBAL device set with per-process
    input feeding.

    The time axis is laid out so each process's local devices hold
    contiguous time blocks; a process only supplies samples for its own
    range (jax.make_array_from_process_local_data assembles the global
    array without gathering data through any single host).
    """

    def __init__(self, n_ch: int, block_wb: int, **kwargs):
        n_dev = len(jax.devices())
        if n_dev % n_ch:
            raise ValueError(f"{n_dev} devices not divisible by n_ch={n_ch}")
        n_time = n_dev // n_ch
        mesh = make_mesh(n_ch, n_time)
        super().__init__(mesh, block_wb, **kwargs)

    @property
    def local_time_blocks(self) -> int:
        """Time blocks this process is responsible for feeding."""
        return max(1, self.n_time // jax.process_count())

    def __call__(self, i_local, q_local):
        """Run one step. In multi-process mode, pass only this process's
        local_time_blocks * block_wb samples; single-process passes the
        full n_time * block_wb stream."""
        sh = NamedSharding(self.mesh, P("time"))
        if jax.process_count() == 1:
            xi = jax.device_put(np.asarray(i_local, np.float32), sh)
            xq = jax.device_put(np.asarray(q_local, np.float32), sh)
        else:
            n_global = self.n_time * self.block_wb
            xi = jax.make_array_from_process_local_data(
                sh, np.asarray(i_local, np.float32), (n_global,))
            xq = jax.make_array_from_process_local_data(
                sh, np.asarray(q_local, np.float32), (n_global,))
        return self.run_placed(xi, xq)
