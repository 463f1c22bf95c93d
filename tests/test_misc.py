"""Coverage for small utilities: BlockStats, vendor TSV loading, pcap to
stdout, graft entry points."""

import gzip
import io
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = str(Path(__file__).resolve().parents[1])


class TestBlockStats:
    def test_throughput_accounting(self):
        import time

        from btle_tpu.utils import BlockStats

        st = BlockStats(samples_per_block=1000, sample_rate_hz=1e6)
        for _ in range(3):
            st.begin()
            time.sleep(0.001)
            st.end()
        assert st.blocks == 3
        assert st.throughput_sps > 0
        assert "3 blocks" in st.summary()


class TestVendorTsv:
    def test_external_tsv_gz(self, tmp_path, monkeypatch):
        from btle_tpu.cli import vendors

        path = tmp_path / "oui.tsv.gz"
        with gzip.open(path, "wt") as fh:
            fh.write("AB:CD:EF\tExample Labs\n")
        monkeypatch.setenv("BTLE_OUI_TSV", str(path))
        vendors._oui_table.cache_clear()
        try:
            assert vendors.oui_lookup("ab:cd:ef:00:11:22") == "Example Labs"
            # built-ins still present
            assert vendors.oui_lookup("B8:27:EB:00:00:00") == "Raspberry Pi Foundation"
        finally:
            # monkeypatch restores the env var; drop the stale cache too
            vendors._oui_table.cache_clear()


class TestPcapStdout:
    def test_decode_pcap_to_stdout(self):
        from test_golden import USRP_BIN

        r = subprocess.run(
            [sys.executable, "-m", "btle_tpu.cli", "decode", "--bin", USRP_BIN,
             "--format", "f32", "--pcap", "-"],
            capture_output=True, timeout=300,
            env={"PYTHONPATH": REPO, "PATH": "/usr/bin:/bin",
                 "JAX_PLATFORMS": "cpu", "HOME": "/root"},
            cwd=REPO,
        )
        assert r.returncode == 0, r.stderr.decode()[-500:]
        # stdout is a pcap stream: magic + one record
        assert r.stdout[:4] == b"\xa1\xb2\xc3\xd4"
        assert len(r.stdout) > 24 + 16 + 14


class TestGraftEntry:
    def test_entry_compiles(self):
        sys.path.insert(0, REPO)
        import __graft_entry__ as ge
        import jax

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        assert out["pos"].shape[0] == 40

    def test_dryrun_multichip(self):
        sys.path.insert(0, REPO)
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestEarliestHits:
    def test_hierarchical_matches_flat_topk(self, rng):
        """earliest_hits' segment-min pre-selection must be exact: any
        segment holding one of the K earliest hits ranks among the K
        smallest segment minima."""
        import jax
        import jax.numpy as jnp

        from btle_tpu.rx.pipeline import earliest_hits

        for trial in range(6):
            n = [131072, 8192, 1000, 131072, 131072, 256][trial]
            density = [1e-4, 0.3, 0.5, 0.0, 1.0, 0.1][trial]
            hit = rng.random(n) < density
            # clustered case: all hits in one segment
            if trial == 3:
                hit[5000:5040] = True
            k = 16
            pos, valid, num = jax.jit(
                lambda h: earliest_hits(h, k, 0), backend="cpu"
            )(jnp.asarray(hit))
            want = np.flatnonzero(hit)[:k]
            got = np.asarray(pos)[np.asarray(valid)]
            np.testing.assert_array_equal(got, want)
            assert int(num) == int(hit.sum())

    def test_min_pos_respected(self, rng):
        import jax.numpy as jnp

        from btle_tpu.rx.pipeline import earliest_hits

        hit = np.zeros(4096, bool)
        hit[[10, 600, 3000]] = True
        pos, valid, num = earliest_hits(jnp.asarray(hit), 4, jnp.int32(500))
        got = np.asarray(pos)[np.asarray(valid)]
        np.testing.assert_array_equal(got, [600, 3000])
        assert int(num) == 2
