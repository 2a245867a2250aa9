"""Multi-process part-sidecar merge semantics + chunked multichain_ess.

Regression tests for the round-3 review findings: a torn part file (one
process killed between appends) must not shift its chains' rows relative to
the other parts, stale sidecars from a previous run must be removable, and
the chunked cross-chain ESS must be chunk-size invariant.
"""

import numpy as np

from ptmcmcsampler_tpu import diagnostics
from ptmcmcsampler_tpu.io.chainfile import ChainWriter


def _block(row0, rows, nchains, ndim):
    """Distinct deterministic rows: value encodes (global_row, chain, dim)."""
    r = np.arange(row0, row0 + rows)[:, None, None]
    c = np.arange(nchains)[None, :, None]
    d = np.arange(ndim)[None, None, :]
    return (r * 100 + c * 10 + d).astype(np.float32)


class TestPartMerge:
    def test_torn_part_stays_row_aligned(self, tmp_path):
        """Part A one block ahead of part B (kill between appends): load_all
        must merge on the COMMON row range, keeping every chain's row r at
        global iteration r (the pre-fix per-part tail seek returned A's rows
        shifted by the overhang)."""
        w = ChainWriter(str(tmp_path), [1.0])
        total, d = 4, 3
        # Part A owns chains [0, 2), part B chains [2, 4).
        w.reset_all(0, 2, d, cstart=0, nchains_total=total)
        w.reset_all(0, 2, d, cstart=2, nchains_total=total)
        full = _block(0, 5, total, d)
        w.append_all(0, full[:4, 0:2], cstart=0, nchains_total=total)
        w.append_all(0, full[:3, 2:4], cstart=2, nchains_total=total)
        # A has one torn extra row beyond the common range.
        w.append_all(0, full[4:5, 0:2], cstart=0, nchains_total=total)

        assert w.all_rows_count(0) == 3
        merged = w.load_all(0)
        assert merged.shape == (3, total, d)
        np.testing.assert_array_equal(merged, full[:3])

        tail = w.load_all(0, tail_rows=2)
        np.testing.assert_array_equal(tail, full[1:3])

    def test_clear_stale_sidecars(self, tmp_path):
        """A fresh multi-process run must be able to wipe the base sidecar
        AND parts from a previous layout; load_all then sees nothing."""
        w = ChainWriter(str(tmp_path), [1.0])
        w.reset_all(0, 4, 2)  # base sidecar (single-process run)
        w.append_all(0, _block(0, 2, 4, 2))
        w.reset_all(0, 1, 2, cstart=3, nchains_total=4)  # old-layout part
        assert w.load_all(0) is not None
        w.clear_stale_sidecars(0)
        assert w.load_all(0) is None
        assert w.all_rows_count(0) == 0


class TestResumeTruncation:
    def test_truncate_parts_then_rerun_block_stays_aligned(self, tmp_path):
        """The round-4 advisor scenario: resume of a torn run re-runs the
        block past the checkpoint, so without truncation the already-ahead
        part appends that block TWICE and all its later rows are offset.
        Truncating parts to the checkpoint row count first must make the
        re-run block overwrite cleanly."""
        w = ChainWriter(str(tmp_path), [1.0])
        total, d = 4, 3
        w.reset_all(0, 2, d, cstart=0, nchains_total=total)
        w.reset_all(0, 2, d, cstart=2, nchains_total=total)
        full = _block(0, 6, total, d)
        # Checkpoint covers 3 rows; part A was killed one block (2 rows)
        # ahead, part B exactly at the checkpoint.
        w.append_all(0, full[:5, 0:2], cstart=0, nchains_total=total)
        w.append_all(0, full[:3, 2:4], cstart=2, nchains_total=total)

        w.truncate_all(0, base_rows=4, part_rows=3)
        assert w.all_rows_count(0) == 3

        # Resume re-runs the torn block and both parts append it again.
        w.append_all(0, full[3:5, 0:2], cstart=0, nchains_total=total)
        w.append_all(0, full[3:5, 2:4], cstart=2, nchains_total=total)
        merged = w.load_all(0)
        assert merged.shape == (5, total, d)
        np.testing.assert_array_equal(merged, full[:5])

    def test_truncate_base_sidecar(self, tmp_path):
        w = ChainWriter(str(tmp_path), [1.0])
        w.reset_all(0, 3, 2)
        full = _block(0, 5, 3, 2)
        w.append_all(0, full)
        w.truncate_all(0, base_rows=2, part_rows=0)
        got = w.load_all(0)
        assert got.shape == (2, 3, 2)
        np.testing.assert_array_equal(got, full[:2])
        # Truncating to more rows than exist is a no-op.
        w.truncate_all(0, base_rows=10, part_rows=0)
        assert w.all_rows_count(0) == 2

    def test_truncate_text(self, tmp_path):
        w = ChainWriter(str(tmp_path), [1.0])
        lines = ["%d\t%f\n" % (i, 0.5 * i) for i in range(6)]
        with open(w.fnames[0], "w") as f:
            f.writelines(lines)
        w.truncate_text(0, 4)
        with open(w.fnames[0]) as f:
            assert f.readlines() == lines[:4]
        w.truncate_text(0, 10)  # no-op past EOF
        with open(w.fnames[0]) as f:
            assert f.readlines() == lines[:4]
        w.truncate_text(0, 0)  # zero keeps ZERO lines, not one
        with open(w.fnames[0]) as f:
            assert f.readlines() == []

    def test_truncate_jump_files(self, tmp_path):
        import os

        w = ChainWriter(str(tmp_path), [1.0])
        names = ["am", "scam"]
        w.init_jump_files(names)
        for k in range(5):
            w.write_jump_stats(names, [1, 1], [10 * (k + 1)] * 2, [k + 1] * 2)
        w.truncate_jump_files(names, 3)
        for name in names:
            with open(os.path.join(str(tmp_path), name + "_jump.txt")) as f:
                assert len(f.readlines()) == 3


class TestChunkedEss:
    def test_chunk_size_invariant(self, monkeypatch):
        rng = np.random.default_rng(3)
        # AR(1) chains so tau > 1 and the Geyer tail is exercised.
        m, n, d = 12, 256, 3
        x = np.zeros((m, n, d), np.float32)
        e = rng.normal(size=(m, n, d))
        for t in range(1, n):
            x[:, t] = 0.7 * x[:, t - 1] + e[:, t]
        whole = diagnostics.multichain_ess(x)
        # Force many tiny chunks (1-2 chains each) and compare.
        monkeypatch.setattr(diagnostics, "_ESS_FFT_CHUNK_BYTES", 1.0)
        chunked = diagnostics.multichain_ess(x)
        np.testing.assert_allclose(chunked, whole, rtol=1e-12)
        assert np.all(whole > 0) and np.all(whole < m * n)
