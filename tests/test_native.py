"""Native C++ component tests: NNW-BDI and the SmaQ HLS golden model.

The BDI exact-encoding cases mirror the reference's Rust unit tests
(/root/reference/libbdi/src/lib.rs:433-458) with stochastic rounding and
zero compression disabled for determinism (lib.rs:407-412).
"""

import numpy as np
import pytest

from smart_quantization_tpu import bdi, smaq_golden


def det_config(**kw):
    base_configs = kw.pop(
        "base_configs",
        [bdi.CompressionBaseConfig(1, 32, d, f"d{d}") for d in (4, 8, 16)],
    )
    cfg = bdi.CompressionConfig(
        base_configs=base_configs,
        use_stochastic_rounding=False,
        use_zero_compression=False,
        use_randomized_base_selection=False,
        **kw,
    )
    return cfg


class TestBDIExactEncodings:
    def test_presentation_example(self):
        # lib.rs:433-439
        line = np.array([0xC04039C0, 0xC04039C8, 0xC04039D0, 0xC04039F8],
                        np.uint32)
        out = bdi.compress_line_exact(det_config(), line)
        np.testing.assert_array_equal(
            out, np.array([0xC04039C0, 0x00, 0x08, 0x10, 0x38], np.uint32)
        )

    def test_perl_bench_example(self):
        # lib.rs:441-450
        line = np.array(
            [0xC04039C0, 0xC04039C8, 0xC04039D0, 0xC04039D8, 0xC04039E0,
             0xC04039E8, 0xC04039F0, 0xC04039F8],
            np.uint32,
        )
        out = bdi.compress_line_exact(det_config(), line)
        np.testing.assert_array_equal(
            out,
            np.array([0xC04039C0, 0x00, 0x08, 0x10, 0x18, 0x20, 0x28, 0x30,
                      0x38], np.uint32),
        )

    def test_uncompressible_without_locality_fails(self):
        # random-looking data with tiny delta budget cannot be covered
        line = np.array([0x00000001, 0x40000000, 0x80000000, 0xC0000000],
                        np.uint32)
        cfg = det_config(
            base_configs=[bdi.CompressionBaseConfig(1, 32, 4, "d4")]
        )
        with pytest.raises(RuntimeError):
            bdi.compress_line_exact(cfg, line)


class TestBDIRoundTrip:
    def test_quantized_int_workflow(self):
        """value = (base<<sfb + delta<<sfd)<<sfi + zero_point, x scale
        (lib.rs:340-349)."""
        rng = np.random.RandomState(0)
        base = 1_000_000
        buf = (base + rng.randint(0, 200, size=256)).astype(np.uint32)
        # deltas are unsigned: with first-fit selection the base must be the
        # line minimum, so pin each cache line's first element to it
        buf[::64] = base
        cfg = bdi.CompressionConfig(
            base_configs=[bdi.CompressionBaseConfig(2, 32, 8, "b2d8")],
            use_stochastic_rounding=False,
            use_randomized_base_selection=False,
        )
        dest = np.zeros(256, np.float32)
        bits, schemes, (c_ns, d_ns) = bdi.replace_with_compressed_repr(
            cfg, buf, dest, scale=0.5, zero_point=10
        )
        expected = (buf.astype(np.int64) + 10).astype(np.float32) * 0.5
        np.testing.assert_allclose(dest, expected)
        assert bits < 256 * 32  # actually compressed
        assert len(schemes) == 4  # 256 / 64 cache lines
        assert c_ns > 0

    def test_zero_compression(self):
        buf = np.zeros(64, np.uint32)
        cfg = bdi.CompressionConfig(
            base_configs=[bdi.CompressionBaseConfig(1, 32, 8, "d8")],
            use_stochastic_rounding=False,
        )
        dest = np.zeros(64, np.float32)
        bits, _, _ = bdi.replace_with_compressed_repr(cfg, buf, dest, 1.0, 0)
        # all-zero line: zero mask (64 bits) + one base (32) only
        assert bits == 64 + 32
        np.testing.assert_allclose(dest, 0.0)

    def test_scale_factor_shifts(self):
        """Right-shift scaling drops low bits; reconstruction is within
        2^sf of the original."""
        rng = np.random.RandomState(1)
        buf = (50_000_000 + rng.randint(0, 1 << 12, size=64)).astype(np.uint32)
        buf[0] = 50_000_000  # first-fit base must be the line minimum
        cfg = bdi.CompressionConfig(
            base_configs=[bdi.CompressionBaseConfig(1, 32, 16, "d16")],
            scale_factor_base=8,
            scale_factor_delta=8,
            use_stochastic_rounding=False,
            use_randomized_base_selection=False,
            use_zero_compression=False,
        )
        dest = np.zeros(64, np.float32)
        bits, _, _ = bdi.replace_with_compressed_repr(cfg, buf, dest, 1.0, 0)
        err = np.abs(dest - buf.astype(np.float32))
        assert err.max() <= (1 << 8) * 2

    def test_multithreaded_large_block(self):
        rng = np.random.RandomState(2)
        buf = (7_000_000 + rng.randint(0, 255, size=64 * 128)).astype(np.uint32)
        buf[::64] = 7_000_000  # first-fit base must be each line's minimum
        cfg = bdi.CompressionConfig(
            base_configs=[bdi.CompressionBaseConfig(1, 32, 8, "d8")],
            use_stochastic_rounding=False,
            use_randomized_base_selection=False,
            num_threads=4,
        )
        dest = np.zeros(buf.size, np.float32)
        bits, schemes, _ = bdi.replace_with_compressed_repr(cfg, buf, dest, 1.0, 0)
        np.testing.assert_allclose(dest, buf.astype(np.float32))
        assert (schemes == 0).all()
        # per line: 64 mask + 32 base + 64*8 deltas = 608 bits
        assert bits == 128 * (64 + 32 + 64 * 8)


class TestSmaQGoldenModel:
    """C++ golden model of the HLS kernels vs a numpy re-derivation —
    validates flag-bit packing and the 2^(b-1)/3 scaling (hw/smaq.cpp)."""

    def test_stats_full(self):
        rng = np.random.RandomState(0)
        x = rng.randn(1024).astype(np.float32) * 2 + 1
        mean, std = smaq_golden.stats(x, mode=0)
        assert mean == pytest.approx(x.mean(), abs=1e-3)
        assert std == pytest.approx(x.std(), rel=1e-3)

    def test_stats_range(self):
        rng = np.random.RandomState(1)
        x = rng.randn(2048).astype(np.float32)
        _, std = smaq_golden.stats(x, mode=1)
        expected = (x.max() - x.min()) / np.sqrt(2 * np.log(2048.0))
        assert std == pytest.approx(expected, rel=1e-4)

    def test_flag_bit_packing(self):
        x = np.array([0.5, -0.5, 2.0, -2.0], np.float32)
        q = smaq_golden.compress(x, mean=0.0, std=1.0)
        # within 1 sigma -> LSB set; scale 2^(6-1)/3 for main, 2^(8-1)/3 else
        assert (q[0] & 1) == 1 and (q[1] & 1) == 1
        assert (q[2] & 1) == 0 and (q[3] & 1) == 0
        assert (q[0] >> 1) == int(0.5 * 32 / 3)
        assert (q[2] >> 1) == int(2.0 * 128 / 3)

    def test_roundtrip_error_bounded(self):
        rng = np.random.RandomState(2)
        x = rng.randn(1024).astype(np.float32)
        mean, std = smaq_golden.stats(x)
        q = smaq_golden.compress(x, mean, std)
        y = smaq_golden.decompress(q, mean, std)
        # truncation quantizer: error bounded by one main-bucket quantum * std
        assert np.abs(y - x).max() <= (3 / 32) * std * 1.01 + (3 / 128) * std

    def test_bn_variant_roundtrip(self):
        rng = np.random.RandomState(3)
        x = rng.randn(512).astype(np.float32)
        mean, std = smaq_golden.stats(x)
        q = smaq_golden.compress_bn(x, mean, std, bn_scalar=2.0, bn_shift=0.25)
        y = smaq_golden.decompress_bn(q, mean, std, 2.0, 0.25)
        assert np.abs(y - x).mean() < 0.1 * std


class TestBDICli:
    def test_cli_compresses_file(self, tmp_path):
        import os
        import subprocess

        exe = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "native", "build", "bdi",
        )
        if not os.path.exists(exe):
            subprocess.run(
                ["make", "-C", os.path.dirname(os.path.dirname(exe))],
                check=True, capture_output=True,
            )
        data = tmp_path / "data.txt"
        base = 3229747136
        data.write_text("\n".join(str(base + 8 * i) for i in range(64)))
        out = subprocess.run(
            [exe, str(data), "0"], capture_output=True, text=True, check=True
        )
        assert "ratio" in out.stdout
        # 64 sequential words compress below 1:1 (randomized base selection
        # may pick a non-minimal base, so the ratio is config-dependent)
        ratio = float(out.stdout.rsplit("ratio", 1)[1].strip(" )\n"))
        assert ratio > 1.4


class TestSmaQGoldenSampleStats:
    def test_sixteen_sample_mode(self):
        rng = np.random.RandomState(4)
        x = rng.randn(4096).astype(np.float32) * 3 + 1
        mean, std = smaq_golden.stats(x, mode=2)
        # 16 strided samples: loose agreement with the population
        assert abs(mean - 1.0) < 3.0
        assert 0.5 < std < 9.0
