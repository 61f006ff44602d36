"""Sampler tests: jnp implementation vs independent numpy mirror, Sobol structure,
Owen-scramble uniformity/stratification."""
import numpy as np
import jax.numpy as jnp
import pytest

from mcrt_tpu.sampling import sobol


def test_reverse_bits():
    xs = np.array([0, 1, 0x80000000, 0xDEADBEEF, 0xFFFFFFFF], dtype=np.uint32)
    got = np.asarray(sobol.reverse_bits(jnp.asarray(xs)))
    expect = np.array([int(f"{x:032b}"[::-1], 2) for x in xs], dtype=np.uint32)
    np.testing.assert_array_equal(got, expect)


def test_jnp_matches_numpy_mirror():
    rng = np.random.RandomState(0)
    for _ in range(50):
        gs = int(rng.randint(0, 2**31))
        pix = int(rng.randint(0, 2**20))
        samp = int(rng.randint(0, 2**16))
        seq = int(rng.randint(0, 20))
        dim = int(rng.randint(0, sobol.NUM_DIMS))
        ctx = sobol.make_ctx(gs, np.array([pix], np.uint32), np.array([samp], np.uint32), jnp.float64)
        if seq > 0:
            ctx = sobol.shuffled(ctx, seq)
        got = float(np.asarray(sobol.sample(ctx, dim))[0])
        expect = sobol.np_reference_sample(gs, pix, samp, seq, dim)
        assert got == pytest.approx(expect, abs=1e-12), (gs, pix, samp, seq, dim)


def test_unscrambled_sobol_first_dims():
    """Direction table sanity: raw (unscrambled) Sobol values.

    Dim 0 is the van der Corput sequence (bit-reversed index); dim 1 (s=1, a=0,
    m=[1]) is the classic second Sobol dimension whose natural-order prefix is
    0.5, 0.75, 0.25, 0.625, 0.125, 0.375, 0.875."""
    for idx in range(1, 64):
        br0 = int(np.asarray(sobol.sobol_bit_reversed(jnp.asarray([idx], jnp.uint32), 0))[0])
        v0 = int(np.asarray(sobol.reverse_bits(jnp.asarray([br0], jnp.uint32)))[0]) * 2.0**-32
        assert v0 == pytest.approx(int(f"{idx:032b}"[::-1], 2) * 2.0**-32, abs=1e-12)
    expect_dim1 = [0.5, 0.75, 0.25, 0.625, 0.125, 0.375, 0.875]
    for idx, expect in zip(range(1, 8), expect_dim1):
        br = int(np.asarray(sobol.sobol_bit_reversed(jnp.asarray([idx], jnp.uint32), 1))[0])
        val = int(np.asarray(sobol.reverse_bits(jnp.asarray([br], jnp.uint32)))[0]) * 2.0**-32
        assert val == pytest.approx(expect, abs=1e-12)


def test_uniformity_and_range():
    n = 1 << 12
    ctx = sobol.make_ctx(1234, np.full(n, 7, np.uint32), np.arange(n, dtype=np.uint32), jnp.float64)
    for dim in range(sobol.NUM_DIMS):
        u = np.asarray(sobol.sample(ctx, dim))
        assert np.all(u >= 0.0) and np.all(u < 1.0)
        assert abs(u.mean() - 0.5) < 0.01
        # Owen-scrambled Sobol keeps elementary-interval stratification: each of the
        # 64 bins of [0,1) gets exactly n/64 points for a power-of-two sample count.
        counts = np.bincount((u * 64).astype(int), minlength=64)
        assert counts.min() == counts.max() == n // 64


def test_decorrelation_across_sequences():
    """Same dims at different sequences (bounces) must decorrelate."""
    n = 1 << 10
    ctx0 = sobol.make_ctx(5, np.full(n, 3, np.uint32), np.arange(n, dtype=np.uint32), jnp.float64)
    a = np.asarray(sobol.sample(sobol.shuffled(ctx0, 1), 0))
    b = np.asarray(sobol.sample(sobol.shuffled(ctx0, 2), 0))
    r = np.corrcoef(a, b)[0, 1]
    assert abs(r) < 0.1


def test_different_pixels_decorrelate_at_bounce_dims():
    """Bounce-dimension samples (sequence >= 1) must decorrelate across pixels —
    this is what prevents structured artifacts in the light transport. (Sequence-0
    pixel-jitter dims of two Owen scrambles of the same net may stay rank-correlated;
    the reference behaves the same way.)"""
    n = 1 << 10
    s = np.arange(n, dtype=np.uint32)
    for dim in range(3):
        a = np.asarray(sobol.sample(sobol.shuffled(sobol.make_ctx(5, np.full(n, 3, np.uint32), s, jnp.float64), 1), dim))
        b = np.asarray(sobol.sample(sobol.shuffled(sobol.make_ctx(5, np.full(n, 4, np.uint32), s, jnp.float64), 1), dim))
        assert abs(np.corrcoef(a, b)[0, 1]) < 0.15
