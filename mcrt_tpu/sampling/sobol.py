"""Hash-based Owen-scrambled Sobol sampling, fully vectorized for TPU.

Semantics-equivalent to the reference's thread-local stateful sampler
(/root/reference/source/sampling/sampler.hpp, sobol.hpp) which implements Brent
Burley's "Practical Hash-based Owen Scrambling" (JCGT 2020). The reference mutates
thread-local state via initiate/setIndex/shuffle; that formulation is already a pure
function of (global_seed, pixel_index, sample_index, sequence, dim), so here it IS
that pure function, mapped over whole ray megabatches as uint32 vector ops — no state,
no divergence, ideal for the VPU.

Dimension allocation follows the reference (sampling.hpp:59-76):
  sequence 0 (camera):  PIXEL=0,1  LENS=2,3
  sequence b>=1 (bounce b): LIGHT=0,1,2  BSDF=3,4  INTERACTION=5  ABSORB=6
  photon emission (sequence 0): PM_LIGHT=0..3 ; photon bounce: PM_REJECT=2

Only 7 Sobol dimensions exist; per-bounce shuffling re-pads them (Burley's "padding").
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# Sobol direction numbers for dimensions 2..7 (first dimension is the bit-reversed
# index). Joe-Kuo "new-joe-kuo-6.21201" primitive polynomials, first 6 dims — public
# data (https://web.maths.unsw.edu.au/~fkuo/sobol/), same set the reference uses
# (sobol.hpp:18-29).
_S = [1, 2, 3, 3, 4, 4]
_A = [0, 1, 1, 2, 1, 4]
_M = [
    [1],
    [1, 3],
    [1, 3, 1],
    [1, 1, 1],
    [1, 1, 3, 3],
    [1, 3, 5, 13],
]

NUM_DIMS = 7  # dim 0 (van der Corput) + 6 tabulated dimensions


def _reverse_bits_u32_np(x: np.ndarray) -> np.ndarray:
    x = ((x & 0xAAAAAAAA) >> 1) | ((x & 0x55555555) << 1)
    x = ((x & 0xCCCCCCCC) >> 2) | ((x & 0x33333333) << 2)
    x = ((x & 0xF0F0F0F0) >> 4) | ((x & 0x0F0F0F0F) << 4)
    x = ((x & 0xFF00FF00) >> 8) | ((x & 0x00FF00FF) << 8)
    return ((x >> 16) | (x << 16)) & 0xFFFFFFFF


def _direction_table() -> np.ndarray:
    """(NUM_DIMS-1, 32) bit-reversed direction numbers (uint32)."""
    table = np.zeros((len(_S), 32), dtype=np.uint64)
    for dim in range(len(_S)):
        s, a, m = _S[dim], _A[dim], _M[dim]
        v = np.zeros(32, dtype=np.uint64)
        for bit in range(s):
            v[bit] = np.uint64(m[bit]) << np.uint64(31 - bit)
        for bit in range(s, 32):
            v[bit] = v[bit - s] ^ (v[bit - s] >> np.uint64(s))
            for k in range(1, s):
                v[bit] ^= np.uint64((a >> (s - 1 - k)) & 1) * v[bit - k]
        table[dim] = v
    return _reverse_bits_u32_np(table.astype(np.uint64) & 0xFFFFFFFF).astype(np.uint32)


BIT_REVERSED_DIRECTIONS = _direction_table()

_U32 = jnp.uint32


def reverse_bits(x):
    """Bit-reverse uint32 (vectorized)."""
    x = x.astype(_U32)
    x = ((x & _U32(0xAAAAAAAA)) >> 1) | ((x & _U32(0x55555555)) << 1)
    x = ((x & _U32(0xCCCCCCCC)) >> 2) | ((x & _U32(0x33333333)) << 2)
    x = ((x & _U32(0xF0F0F0F0)) >> 4) | ((x & _U32(0x0F0F0F0F)) << 4)
    x = ((x & _U32(0xFF00FF00)) >> 8) | ((x & _U32(0x00FF00FF)) << 8)
    return (x >> 16) | (x << 16)


def hash32(x):
    """hash-prospector 2-round low-bias hash (sampler.hpp:76-84 equivalent)."""
    x = x.astype(_U32)
    x ^= x >> 15
    x *= _U32(0xD168AAAD)
    x ^= x >> 15
    x *= _U32(0xAF723597)
    x ^= x >> 15
    return x


def hash_combine(seed, v):
    """Boost hash_combine on uint32."""
    seed = seed.astype(_U32) if hasattr(seed, "astype") else _U32(seed)
    return seed ^ (v + _U32(0x9E3779B9) + (seed << 6) + (seed >> 2))


def laine_karras_scramble(bit_reversed_x, seed):
    """Improved Laine-Karras hash (Vegdahl variant) acting on a bit-reversed value;
    returns the bit-reversed result — i.e. a nested uniform (Owen) scramble."""
    x = bit_reversed_x.astype(_U32)
    x ^= x * _U32(0x3D20ADEA)
    x += seed
    x *= (seed >> 16) | _U32(1)
    x ^= x * _U32(0x05526C56)
    x ^= x * _U32(0x53A22864)
    return reverse_bits(x)


def sobol_bit_reversed(index, dim: int):
    """Bit-reversed Sobol sample of dimension `dim` at (plain-order) `index`.

    For dim 0 the Sobol sample is reverse_bits(index), whose bit reversal is the index
    itself. For dims >= 1 we XOR the tabulated bit-reversed direction numbers selected
    by the index bits.
    """
    index = index.astype(_U32)
    if dim == 0:
        return index
    dirs = BIT_REVERSED_DIRECTIONS[dim - 1]
    x = jnp.zeros_like(index)
    for bit in range(32):
        x = x ^ (jnp.where((index >> bit) & _U32(1), _U32(int(dirs[bit])), _U32(0)))
    return x


def _u32_to_unit(x, dtype):
    # * 0x1p-32, matching the reference's float conversion
    return x.astype(dtype) * jnp.asarray(2.0 ** -32, dtype)


class SampleCtx:
    """Pure-functional view of the reference sampler state for a batch of paths.

    base_seed = hash_combine(global_seed, hash(pixel_index))      [initiate]
    per sample_index:                                             [setIndex]
        bit_reversed_index = reverse_bits(sample_index)
        sequence 0: seed = base_seed, shuffled_index = sample_index
    per sequence s >= 1:                                          [shuffle]
        seed_s = hash_combine(base_seed, hash(s))
        shuffled_index_s = laine_karras_scramble(bit_reversed_index, seed_s)
    sample(dim) = laine_karras_scramble(sobol_br(shuffled_index), hash_combine(seed, hash(dim))) * 2^-32
    """

    __slots__ = ("seed", "shuffled_index", "base_seed", "bit_reversed_index", "dtype")

    def __init__(self, seed, shuffled_index, base_seed, bit_reversed_index, dtype):
        self.seed = seed
        self.shuffled_index = shuffled_index
        self.base_seed = base_seed
        self.bit_reversed_index = bit_reversed_index
        self.dtype = dtype


def make_ctx(global_seed, pixel_index, sample_index, dtype=jnp.float32) -> SampleCtx:
    """Context at sequence 0 (camera dims)."""
    pixel_index = jnp.asarray(pixel_index, dtype=_U32)
    sample_index = jnp.asarray(sample_index, dtype=_U32)
    gseed = _U32(global_seed) if isinstance(global_seed, int) else global_seed.astype(_U32)
    base_seed = hash_combine(gseed, hash32(pixel_index))
    return SampleCtx(
        seed=base_seed,
        shuffled_index=sample_index,
        base_seed=base_seed,
        bit_reversed_index=reverse_bits(sample_index),
        dtype=dtype,
    )


def shuffled(ctx: SampleCtx, sequence) -> SampleCtx:
    """Context at bounce `sequence` (>= 1): decorrelates (re-pads) the 7 dims."""
    seq = jnp.asarray(sequence, dtype=_U32)
    seed = hash_combine(ctx.base_seed, hash32(seq))
    shuffled_index = laine_karras_scramble(ctx.bit_reversed_index, seed)
    return SampleCtx(seed, shuffled_index, ctx.base_seed, ctx.bit_reversed_index, ctx.dtype)


def sample(ctx: SampleCtx, dim: int):
    """Owen-scrambled Sobol sample in [0,1) for dimension `dim` at the ctx's sequence."""
    br = sobol_bit_reversed(ctx.shuffled_index, dim)
    scrambled = laine_karras_scramble(br, hash_combine(ctx.seed, hash32(jnp.broadcast_to(_U32(dim), br.shape))))
    return _u32_to_unit(scrambled, ctx.dtype)


def sample_n(ctx: SampleCtx, start_dim: int, n: int):
    """n consecutive dimensions starting at start_dim; returns a tuple."""
    return tuple(sample(ctx, start_dim + i) for i in range(n))


# ---------------------------------------------------------------------------------
# Reference-free numpy mirror used by tests to cross-check the jnp implementation.
# ---------------------------------------------------------------------------------

def _np_hash(x):
    x = np.uint32(x)
    x ^= x >> np.uint32(15)
    x = np.uint32((int(x) * 0xD168AAAD) & 0xFFFFFFFF)
    x ^= x >> np.uint32(15)
    x = np.uint32((int(x) * 0xAF723597) & 0xFFFFFFFF)
    x ^= x >> np.uint32(15)
    return x


def _np_hash_combine(seed, v):
    seed, v = int(seed), int(v)
    return np.uint32((seed ^ (v + 0x9E3779B9 + ((seed << 6) & 0xFFFFFFFF) + (seed >> 2))) & 0xFFFFFFFF)


def _np_scramble(x, seed):
    x, seed = int(x), int(seed)
    x ^= (x * 0x3D20ADEA) & 0xFFFFFFFF
    x &= 0xFFFFFFFF
    x = (x + seed) & 0xFFFFFFFF
    x = (x * ((seed >> 16) | 1)) & 0xFFFFFFFF
    x ^= (x * 0x05526C56) & 0xFFFFFFFF
    x &= 0xFFFFFFFF
    x ^= (x * 0x53A22864) & 0xFFFFFFFF
    x &= 0xFFFFFFFF
    return int(_reverse_bits_u32_np(np.array(x, dtype=np.uint64)))


def np_reference_sample(global_seed, pixel_index, sample_index, sequence, dim):
    """Scalar numpy mirror of sample() for testing."""
    base_seed = _np_hash_combine(np.uint32(global_seed), _np_hash(pixel_index))
    if sequence == 0:
        seed = int(base_seed)
        shuffled_index = int(sample_index)
    else:
        seed = int(_np_hash_combine(base_seed, _np_hash(sequence)))
        bri = int(_reverse_bits_u32_np(np.array(sample_index, dtype=np.uint64)))
        shuffled_index = _np_scramble(bri, seed)
    if dim == 0:
        br = shuffled_index
    else:
        dirs = BIT_REVERSED_DIRECTIONS[dim - 1]
        br, idx = 0, shuffled_index
        bit = 0
        while idx:
            if idx & 1:
                br ^= int(dirs[bit])
            idx >>= 1
            bit += 1
    scrambled = _np_scramble(br, _np_hash_combine(seed, _np_hash(dim)))
    return scrambled * 2.0 ** -32
