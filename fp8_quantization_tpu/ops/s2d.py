"""Space-to-depth stem transform (exact, TPU-classic).

The ResNet stem — conv 7x7, stride 2, padding 3 on an (N, 224, 224, 3)
image — is the worst conv shape on a TPU: cin=3 underfills the 128-lane
MXU registers ~40x, and XLA runs it HBM-bound at ~55% of its
speed-of-light (RESULTS.md round-3 per-fusion table).  The classic fix
(used by the MLPerf TPU ResNet submissions) is a pure re-indexing:

    conv7x7/s2/p3 on (N, H, W, C)
  ==  conv4x4/s1/pad((2,1),(2,1)) on the block-2 space-to-depth input
      (N, H/2, W/2, 4C), with the 7x7 kernel zero-padded to 8x8 at the
      top-left and reshaped to (4, 4, 4C, F).

Derivation: out[p] = sum_u x[2p + u - 3] K[u].  Write the input index as
2a + r (a = s2d position, r = row parity = the s2d sub-channel): u even
gives r=1, a = p + u/2 - 2; u odd gives r=0, a = p + (u-1)/2 - 1.  The
taps therefore span a-offsets {-2..+1} — a 4-tap stride-1 conv with
asymmetric padding (2, 1) — and the new kernel gathers
K2[i, di] = K[2i + di - 1] (zero at i=0, di=0, i.e. the top-left pad row).

This is EXACT — not an approximation — for any kernel values, so it can be
applied AFTER weight fake-quantization: fake-quant the original (7,7,C,F)
kernel (per-channel maxval over F is a pure re-indexing away), then
rearrange; the injected zero taps contribute exactly zero.  The win is
structural: the 4x4/s1 conv on 12 channels im2col's to K=192 (vs 147),
fills lanes 4x better, and drops the strided access pattern.

No reference counterpart (the reference runs the stem through cuDNN as-is,
models/resnet_quantized.py:54-60); this is TPU-first deployment work.
"""

from __future__ import annotations

import jax.numpy as jnp


def space_to_depth(x, block: int = 2):
    """(N, H, W, C) -> (N, H/b, W/b, b*b*C); channel order (di, dj, c).

    Pure reshape/transpose — XLA lowers it to one copy (and fuses it into
    the serving-input convert when both appear).
    """
    n, h, w, c = x.shape
    if h % block or w % block:
        raise ValueError(f"spatial dims {(h, w)} not divisible by {block}")
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // block, w // block, block * block * c)


def s2d_stem_kernel(w):
    """Rearrange a (7, 7, C, F) stride-2 kernel for the s2d input.

    Returns (w2, strides, padding): w2 is (4, 4, 4C, F) with channel order
    matching :func:`space_to_depth`; use with strides (1, 1) and padding
    ((2, 1), (2, 1)).  Apply AFTER weight fake-quant — the transform is a
    re-indexing plus exact-zero taps, so quantize-then-rearrange equals
    the original conv for every quantization method.
    """
    kh, kw, cin, f = w.shape
    if (kh, kw) != (7, 7):
        raise ValueError(f"s2d stem transform expects a 7x7 kernel, got "
                         f"{(kh, kw)}")
    # W2[i, di] = W[2i + di - 1]: pad one zero row/col at the front
    # (length 8 = 2*4), then split each spatial axis into (tap, parity).
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = wp.reshape(4, 2, 4, 2, cin, f).transpose(0, 2, 1, 3, 4, 5)
    return (w2.reshape(4, 4, 4 * cin, f), (1, 1), ((2, 1), (2, 1)))
