"""Flash attention for the quantized ViT's deployment path.

The ViT's attention math (models/vit.py) is intentionally unquantized —
the paper quantizes matmul operands, not probabilities — but the naive
chain materializes the (B, H, S, S) logits tensor in HBM three times
(logits write, softmax read/write, weighted-sum read).  At ViT-S/16
serving shapes that chain dominates the whole model's traffic (round-3
measurement: 15.8 GB of 15.8 GB XLA bytes, identical for fp8 and fp32 —
RESULTS.md), so neither side of the quantization A/B can move until the
softmax stops hitting HBM.

This wraps jax.experimental's Pallas TPU flash-attention kernel (tiled
online-softmax: logits live only in VMEM) for inference:

  * ViT sequence lengths (196 patches + cls = 197) are not multiples of
    the kernel's 128-lane blocks; q/k/v are zero-padded to the next
    multiple and the pad is masked via SegmentIds (pad tokens get a
    different segment id, so real queries never attend to them; pad
    queries attend only to pad keys and their rows are sliced off).
  * Operands are cast to bf16 (the MXU rate the rest of the deployment
    path already runs at); softmax statistics inside the kernel are f32.
    The fp32-vs-flash delta is ~2^-9 relative — the same order as the
    deployment path's bf16 conv stores, pinned by tests/test_vit.py.
  * On the CPU backend (tests) the kernel runs under Pallas TPU interpret
    mode, same convention as every other kernel in ops/pallas/.

Gated per shape by autotune.attn_wins (fused vs the composed einsum +
softmax chain, measured once on the attached device).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pad_to(x, s_to, axis):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, s_to - x.shape[axis])
    return jnp.pad(x, pad)


def flash_mha(q: jax.Array, k: jax.Array, v: jax.Array, *,
              sm_scale: float) -> jax.Array:
    """softmax(q @ k^T * sm_scale) @ v for (B, H, S, D) operands.

    Returns f32, shape of ``q``.  S is padded to a multiple of 128
    in-graph; D must already be MXU-friendly (ViT-S: 64).
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, h, s, d = q.shape
    s_pad = max(128, -(-s // 128) * 128)
    qp, kp, vp = (_pad_to(t.astype(jnp.bfloat16), s_pad, 2)
                  for t in (q, k, v))
    if s_pad != s:
        ids = (jnp.arange(s_pad) < s).astype(jnp.int32)   # 1 real, 0 pad
        ids = jnp.broadcast_to(ids, (b, s_pad))
        seg = fa.SegmentIds(q=ids, kv=ids)
    else:
        seg = None

    from fp8_quantization_tpu.ops.pallas.common import on_cpu_backend
    if on_cpu_backend():
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            out = fa.flash_attention(qp, kp, vp, segment_ids=seg,
                                     sm_scale=sm_scale)
    else:
        out = fa.flash_attention(qp, kp, vp, segment_ids=seg,
                                 sm_scale=sm_scale)
    return out[:, :, :s, :].astype(jnp.float32)
