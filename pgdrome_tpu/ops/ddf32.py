"""Double-float32 ("dd") compensated arithmetic for TPU.

TPUs have no hardware float64.  A dd number represents a value as an
unevaluated sum ``hi + lo`` of two float32s with ``|lo| <= ulp(hi)/2``,
giving ~2^-48 relative precision (between f32's 2^-24 and f64's 2^-53)
using only correctly-rounded f32 adds/muls — which the TPU VPU provides
(the MXU's bf16 truncation only affects dot/conv ops, never the
elementwise ops used here; see pallas guide).

The framework uses this for the residual-cascade rhs contraction:
cascade stages ship load-stack rows of magnitude ~1/s that cancel to
O(1) in the per-dim rhs assembly, and resolving that cancellation in
plain f32 floors deep cascades at ~1.5e-6 (PERF.md round-3).  The host
fallback (`SeparatedPGD(rhs_f64=True)`) needs an x64 backend; this
module is the TPU-native equivalent (`rhs_comp=True`), keeping deep
cascades entirely on-chip.

All functions are elementwise over same-shaped arrays (broadcasting
allowed) and jit/vmap-safe.  Error-free transforms are the textbook
ones (Knuth two_sum, Dekker split/two_prod with the f32 split constant
2^12+1); reference: Ogita-Rump-Oishi, "Accurate sum and dot product".
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_SPLIT = 4097.0  # 2^12 + 1: Dekker split constant for float32 (24-bit mantissa)


def two_sum(a, b):
    """Error-free sum: s + e == a + b exactly, s = fl(a+b)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free sum assuming |a| >= |b| (3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    c = a * _SPLIT
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product: p + e == a * b exactly, p = fl(a*b)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def dd_add(xh, xl, yh, yl):
    """dd + dd (QD-library "ieee" accurate variant, ~20 flops).

    Absolute error ~eps32²·max(|x|,|y|) per op — dd holds 2^-48 relative
    OF THE OPERANDS, so a sum cancelling by a factor C recovers the
    result to ~C·2^-48 relative (vs C·2^-24 plain f32).  For the rhs
    cascades C ≲ 1e6-1e8, leaving 2-3 orders of margin under the 1e-6
    target; host rhs_f64 remains the fallback for pathological C."""
    sh, se = two_sum(xh, yh)
    th, te = two_sum(xl, yl)
    se = se + th
    sh, se = fast_two_sum(sh, se)
    se = se + te
    return fast_two_sum(sh, se)


def dd_mul(xh, xl, yh, yl):
    """dd * dd (drops the xl*yl term: O(eps^2) of the result)."""
    p, e = two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return fast_two_sum(p, e)


def dd_mul_f(xh, xl, f):
    """dd * plain-f32."""
    p, e = two_prod(xh, f)
    e = e + xl * f
    return fast_two_sum(p, e)


def dd_sum(h, l, axis=0):
    """Compensated reduction along ``axis``: pairwise binary-tree fold of
    dd_add, fully vectorized (log2(n) elementwise passes — no scan).
    Odd levels are padded by one zero row only (an up-front pad to the
    next power of two would nearly double the first folds' memory and
    flops at e.g. n=2049; zero-padding is exact under dd_add)."""
    h = jnp.moveaxis(h, axis, 0)
    l = jnp.moveaxis(l, axis, 0)
    pad1 = [(0, 1)] + [(0, 0)] * (h.ndim - 1)
    while h.shape[0] > 1:
        if h.shape[0] % 2:
            h = jnp.pad(h, pad1)
            l = jnp.pad(l, pad1)
        half = h.shape[0] // 2
        h, l = dd_add(h[:half], l[:half], h[half:], l[half:])
    return h[0], l[0]


def dd_from_f64(x):
    """Host-side: split a float64 array into a dd pair stacked on the
    LAST axis, shape (..., 2) — the storage layout the separated fast
    path uses for ``rhs_comp`` stacks (leading axes keep their meaning,
    e.g. rhs stacks stay (R, n, 2) with num_rhs == shape[0])."""
    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return np.stack([hi, lo], axis=-1)


def dd_dot(R_dd, F):
    """Compensated row-wise dot: ``w_r = Σ_i R[r, i] · F[i]`` with the
    stack ``R_dd`` in dd storage (R, n, 2) and ``F`` plain f32 (n,).
    Returns the dd pair (wh, wl), each (R,)."""
    ph, pl = dd_mul_f(R_dd[..., 0], R_dd[..., 1], F[None, :])
    return dd_sum(ph, pl, axis=1)


def dd_contract(ch, cl, R_dd):
    """Compensated stack contraction ``b_i = Σ_r c_r · R[r, i]`` with
    dd coefficients (ch, cl) of shape (R,) and the stack in dd storage
    (R, n, 2).  Returns plain f32 (n,) — the collapse is lossless once
    the cancellation has been resolved in dd."""
    ph, pl = dd_mul(ch[:, None], cl[:, None], R_dd[..., 0], R_dd[..., 1])
    bh, bl = dd_sum(ph, pl, axis=0)
    return bh + bl
