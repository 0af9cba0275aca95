"""Contiguous-substring check (reference circuits/utils/substring_check.circom).

The circom template uses a polynomial-packing trick to make the check cheap in
R1CS (substring_check.circom:45-67); in straight-line device code the direct
windowed byte comparison is both exact and XLA-friendly (one vectorized
compare over all offsets). Semantics are identical: the match offset must lie
in [0, mainLen - subLen], and the gadget *requires* subLen <= mainLen and
byte-string inputs (substring_check.circom:32-38)."""

from __future__ import annotations

import jax.numpy as jnp

from .bytesops import I32, is_byte_string


def substring_check(main, main_len, sub):
    """main: (..., maxMainLen) bytes, main_len: (...,), sub: (..., subLen).

    Returns (found, ok): found=1 iff sub occurs in main[0:main_len];
    ok = the gadget's own assertions (byte strings, subLen <= mainLen <= max).
    """
    max_main = main.shape[-1]
    sub_len = sub.shape[-1]
    assert sub_len <= 31
    main_len = jnp.asarray(main_len, I32)

    ok = (
        is_byte_string(sub)
        & is_byte_string(main)
        & (main_len <= max_main)
        & (jnp.asarray(sub_len, I32) <= main_len)
    )

    n_off = max_main - sub_len + 1
    # windows[..., i, :] = main[..., i:i+sub_len]
    windows = jnp.stack([main[..., i : i + sub_len] for i in range(n_off)], axis=-2)
    matches = jnp.all(windows == sub[..., None, :], axis=-1)  # (..., n_off)
    allowed = jnp.arange(n_off, dtype=I32) <= (main_len - sub_len)[..., None]
    found = jnp.any(matches & allowed, axis=-1)
    return found.astype(I32), ok
