"""KMerContext equivalent: 8-bit predecessor/successor base sets.

Bit layout matches the reference (src/kmers/KMerContext.h:36-57):
high nibble = predecessor base bits, low nibble = successor base bits,
bit 0 = A, bit 1 = C, bit 2 = G, bit 3 = T.

All functions operate on integer arrays (numpy or jnp).
"""

from __future__ import annotations

import numpy as np

U8 = np.uint32  # contexts are carried as uint32 lanes on device


def make_context(pred_code, succ_code, has_pred, has_succ):
    """Context byte from optional predecessor/successor base codes."""
    one = np.uint32(1)
    pred = (one << pred_code) << 4
    succ = one << succ_code
    return pred * has_pred + succ * has_succ


def rc_bits4(b):
    """Reverse the 4 base bits (A<->T, C<->G): bit i -> bit 3-i."""
    return ((b & 1) << 3) | ((b & 2) << 1) | ((b & 4) >> 1) | ((b & 8) >> 3)


def rc_context(ctx):
    """Reverse-complement a context: swap nibbles + complement bases.

    Matches KMerContext::rc (src/kmers/KMerContext.h:75 gRCVals table).
    """
    pred = (ctx >> 4) & 0xF
    succ = ctx & 0xF
    return (rc_bits4(succ) << 4) | rc_bits4(pred)


def pred_bits(ctx):
    return (ctx >> 4) & 0xF


def succ_bits(ctx):
    return ctx & 0xF


def popcount4(b):
    """Number of set bits in a 4-bit value."""
    return (b & 1) + ((b >> 1) & 1) + ((b >> 2) & 1) + ((b >> 3) & 1)


def single_base(b):
    """Base code of the single set bit (undefined if popcount != 1)."""
    return ((b >> 1) & 1) + ((b >> 2) & 1) * 2 + ((b >> 3) & 1) * 3
