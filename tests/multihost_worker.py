"""Worker script for the real multi-process jax.distributed test.

Launched twice by tests/test_multiprocess.py (process 0 and 1), each with
4 virtual CPU devices; together they form an 8-device (1, 8) mesh. Each
process feeds only its own half of a wideband stream containing one
packet per half; process 0 writes the gathered packet list as JSON.
"""

import json
import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]
out_path = sys.argv[4]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from btle_tpu.dist.multihost import MultiHostWidebandScan, init_distributed
from btle_tpu.golden import model as G
from btle_tpu.spec import bits as B
from btle_tpu.wideband import synthesize_wideband

init_distributed(f"localhost:{port}", num_procs, proc_id)
assert jax.process_count() == num_procs

block_wb = 40000
n_time = 8
scan = MultiHostWidebandScan(n_ch=1, block_wb=block_wb, num_taps=640,
                             max_candidates=4)
assert scan.n_time == n_time

# deterministic scene: both processes synthesize the full stream, then
# each feeds only its own half (as a real per-host digitizer would)
rng = np.random.default_rng(0)
signals, offsets = {}, {}
for ch, wb_off in ((37, 20000), (17, 200000)):
    hb = 0x40 if ch in (37, 38, 39) else 0x01
    payload = rng.integers(0, 256, 8, dtype=np.uint8)
    pdu = B.bytes_to_bits(np.concatenate([[hb, 8], payload]).astype(np.uint8))
    phy = G.assemble_phy_bits(pdu, ch)
    signals[ch] = G.gfsk_modulate_float(phy, 80)
    offsets[ch] = wb_off
n = n_time * block_wb
wi, wq = synthesize_wideband(signals, n, offsets)

half = n // num_procs
lo, hi = proc_id * half, (proc_id + 1) * half
out = scan(wi[lo:hi], wq[lo:hi])
# materialize the distributed candidate arrays on every process
from jax.experimental import multihost_utils

out_full = {k: np.asarray(multihost_utils.process_allgather(v, tiled=True))
            for k, v in out.items()}
packets = scan.gather_packets(out_full)

if proc_id == 0:
    result = [
        {"ch": p.channel, "pos": p.sample_pos, "crc_ok": bool(p.crc_ok),
         "pdu": bytes(p.pdu_bytes).hex()}
        for p in packets if p.crc_ok
    ]
    with open(out_path, "w") as fh:
        json.dump(result, fh)
print(f"proc {proc_id} done", flush=True)
