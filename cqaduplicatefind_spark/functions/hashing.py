"""Deterministic 64-bit hashing primitives shared by the signature kernels.

Public constructions only: blake2b (stdlib) for string -> u64 base hashes, the
splitmix64 finalizer (Steele et al., public domain constants) for cheap vectorized
mixing, and order-sensitive polynomial combination for token k-shingles.

Everything is seed-parameterized and wall-clock-free so signatures are reproducible
across runs, partitionings, and parallelism levels (required for the local[8] ==
local[32] determinism check in BASELINE.md).
"""

from __future__ import annotations

import hashlib

import numpy as np

_U64 = np.uint64
_MASK64 = _U64(0xFFFFFFFFFFFFFFFF)

# splitmix64 finalizer constants (public domain)
_SM_GAMMA = _U64(0x9E3779B97F4A7C15)
_SM_M1 = _U64(0xBF58476D1CE4E5B9)
_SM_M2 = _U64(0x94D049BB133111EB)

# distinct odd multipliers for positional shingle combination
_SHINGLE_MULTS = np.array(
    [
        0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
        0xD6E8FEB86659FD93, 0xA0761D6478BD642F, 0xE7037ED1A0B428DB,
        0x8EBC6AF09C88C6E3, 0x589965CC75374CC3, 0x1D8E4E27C47D124F,
        0xEB44ACCAB455D165, 0x9C6E6877736C46E3, 0xCB9E59B1D9F0855B,
    ],
    dtype=np.uint64,
)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 ndarray."""
    with np.errstate(over="ignore"):
        z = (x + _SM_GAMMA) & _MASK64
        if np.ndim(z) == 0:  # numpy scalar input (e.g. single hash values)
            z = (z ^ (z >> _U64(30))) * _SM_M1 & _MASK64
            z = (z ^ (z >> _U64(27))) * _SM_M2 & _MASK64
            return z ^ (z >> _U64(31))
        return splitmix64_inplace(z)


def splitmix64_inplace(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer applied in place (input must already include the +gamma
    step when emulating ``splitmix64``; callers that build ``z = x ^ seed`` style
    inputs apply gamma themselves). Single scratch buffer, no chained temporaries —
    the signature kernels are memory-bandwidth-bound, and the naive expression
    allocates ~10 array temporaries per call, which saturates DRAM when many
    executor workers run concurrently."""
    t = np.empty_like(z)
    with np.errstate(over="ignore"):
        np.right_shift(z, _U64(30), out=t)
        np.bitwise_xor(z, t, out=z)
        np.multiply(z, _SM_M1, out=z)
        np.right_shift(z, _U64(27), out=t)
        np.bitwise_xor(z, t, out=z)
        np.multiply(z, _SM_M2, out=z)
        np.right_shift(z, _U64(31), out=t)
        np.bitwise_xor(z, t, out=z)
    return z


def hash_str_u64(s: str, seed: int = 0) -> int:
    """Stable 64-bit hash of a string (blake2b, keyed by seed)."""
    h = hashlib.blake2b(
        s.encode("utf-8"), digest_size=8, key=seed.to_bytes(8, "little")
    )
    return int.from_bytes(h.digest(), "little")


class TokenHasher:
    """Caches token -> u64 hashes across Arrow batches (tokens are Zipfian, so the
    cache hit-rate is high; one blake2b per *unique* token per executor process)."""

    def __init__(self, seed: int) -> None:
        self.seed = seed
        self._cache: dict[str, int] = {}

    def hash_tokens(self, tokens: list[str]) -> np.ndarray:
        cache = self._cache
        seed = self.seed
        out = np.empty(len(tokens), dtype=np.uint64)
        for i, t in enumerate(tokens):
            v = cache.get(t)
            if v is None:
                v = hash_str_u64(t, seed)
                if len(cache) < 1_000_000:  # bound executor memory
                    cache[t] = v
            out[i] = v
        return out


def shingle_hashes(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """Order-sensitive k-shingle hashes from token hashes, fully vectorized.

    shingle_i = splitmix64( XOR_j mult_j * token_hash[i+j] ) — positional multipliers
    keep permuted token windows distinct. Returns empty array when fewer than k tokens.
    """
    n = len(token_hashes)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        acc = (token_hashes[0 : n - k + 1] * _shingle_mult(0)) & _MASK64
        for j in range(1, k):
            acc = acc ^ ((token_hashes[j : n - k + 1 + j] * _shingle_mult(j)) & _MASK64)
    return splitmix64(acc)


def _shingle_mult(j: int) -> np.uint64:
    """Positional multiplier: fixed table for small j (pins existing signatures),
    derived odd constants beyond it (arbitrary window lengths, e.g. span search).

    The stream offset wraps in PYTHON ints (mod 2^64): the numpy uint64 scalar
    product would emit an unsuppressed overflow RuntimeWarning on every
    executor batch for the long windows (span/winnow grams) that reach this
    branch, and the old ``% _MASK64`` was mod 2^64-1 — numerically identical
    for every value except the measure-zero wrap 2^64-1, but not the masked
    construction the rest of the file uses."""
    if j < len(_SHINGLE_MULTS):
        return _SHINGLE_MULTS[j]
    return splitmix64(np.uint64((j * int(_SM_GAMMA)) % (1 << 64))) | _U64(1)


# polynomial rolling-hash base (odd -> invertible mod 2^64) and its inverse,
# used for O(1)-per-window content hashes (span search, winnowing): with
# T[k] = sum_{j<k} v[j] * Binv^j and Bpow[i] = B^i, the position-independent
# hash of window [i, i+L) is (T[i+L] - T[i]) * Bpow[i] — two vector ops for ALL
# windows of a length at once, vs the O(n*L) per-length shingle combination.
_POLY_B = 0x9E3779B97F4A7C15  # odd


def _inv_u64(a: int) -> int:
    """Modular inverse of an odd a mod 2^64 (Newton-Hensel iteration)."""
    x = a
    for _ in range(6):
        x = (x * (2 - a * x)) & 0xFFFFFFFFFFFFFFFF
    return x


_POLY_BINV = _inv_u64(_POLY_B)


class RollingHash:
    """Precomputed prefix state for O(1)-per-window polynomial hashes of a uint64
    token-hash array. Window hashes are position-independent: equal token runs
    yield equal hashes at any offset in any document."""

    def __init__(self, v: np.ndarray) -> None:
        n = len(v)
        self.n = n
        if n == 0:
            self._t = np.zeros(1, dtype=np.uint64)
            self._bpow = np.ones(1, dtype=np.uint64)
            return
        with np.errstate(over="ignore"):
            binv_pows = np.ones(n, dtype=np.uint64)
            if n > 1:
                binv_pows[1:] = _U64(_POLY_BINV)
                np.cumprod(binv_pows, out=binv_pows)
            t = np.empty(n + 1, dtype=np.uint64)
            t[0] = 0
            np.cumsum(v * binv_pows, out=t[1:])
            bpow = np.ones(n + 1, dtype=np.uint64)
            bpow[1:] = _U64(_POLY_B)
            np.cumprod(bpow, out=bpow)
        self._t = t
        self._bpow = bpow

    def windows(self, length: int) -> np.ndarray:
        """Hashes of every contiguous window of ``length`` tokens (empty when the
        document is shorter)."""
        n = self.n
        if length <= 0 or length > n:
            return np.empty(0, dtype=np.uint64)
        t = self._t
        with np.errstate(over="ignore"):
            return (t[length:] - t[: n - length + 1]) * self._bpow[: n - length + 1]


def winnow_params(min_span: int) -> tuple[int, int]:
    """(gram length L, winnow window w) with L + w - 1 = min_span: any shared run
    of >= min_span tokens shares a winnowed fingerprint (Schleimer et al. 2003).
    L ~= 0.8*min_span keeps fingerprint density ~= 2/(w+1) ~= 10/min_span per
    token position."""
    gram = max(2, (min_span * 4) // 5)
    window = max(1, min_span - gram + 1)
    return gram, window


def winnow_kernel(tok_hashes: np.ndarray, gram: int, window: int) -> np.ndarray:
    """Distinct winnowed fingerprints (int64 views) of one doc's token hashes.
    L-gram hashes come from the O(1)-per-window rolling scheme — O(n) per doc."""
    g = RollingHash(tok_hashes).windows(gram)
    if len(g) == 0:
        return np.empty(0, dtype=np.int64)
    if len(g) <= window:
        return np.unique(g.min(keepdims=True)).view(np.int64)
    wins = np.lib.stride_tricks.sliding_window_view(g, window)
    return np.unique(wins.min(axis=1)).view(np.int64)


def perm_seeds(num_perms: int, seed: int) -> np.ndarray:
    """Deterministic per-permutation seeds for the MinHash family."""
    base = np.arange(num_perms, dtype=np.uint64) + _U64(seed & 0xFFFFFFFFFFFFFFFF)
    return splitmix64(splitmix64(base) ^ _SM_GAMMA)
