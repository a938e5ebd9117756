"""Simulated FP8 quantization as pure JAX functions.

The paper's key identity: FP8 quantization is INT quantization with per-element
power-of-2 scales ``2^(floor(log2|x|)+bias) - M - bias)`` derived from a
(possibly per-channel, possibly learned) ``maxval`` and mantissa-bit count
``M``  (reference: quantization/quantizers/fp8_quantizer.py:91-133).

Everything here is shape-static, jit-friendly and differentiable: ``maxval``
and ``mantissa_bits`` gradients flow exactly as in the reference (the
``floor(log2|x|)`` term is stop-gradiented, mirroring ``.detach()`` at
fp8_quantizer.py:128; rounding uses the STE).

Grid enumeration helpers (the test oracle) mirror
fp8_quantizer.py:13-50 (generate_all_values_fp / generate_all_float_values_scaled)
and :82-88 (get_max_value).
"""

from __future__ import annotations

from itertools import product

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.ops.rounding import round_ste


def generate_all_values_fp(num_total_bits: int = 8, num_exponent_bits: int = 4,
                           bias: int = 8) -> np.ndarray:
    """Enumerate every representable value of an EmMn format (signed, subnormals).

    Sorted ndarray of 2**num_total_bits values (±0 both present).  This is the
    ground-truth grid used by tests and the analytical subsystem.
    Reference: fp8_quantizer.py:13-41.
    """
    num_fraction_bits = num_total_bits - 1 - num_exponent_bits
    all_values = []
    for sign in (-1.0, 1.0):
        for e_bits in product(*[[0, 1]] * num_exponent_bits):
            e_enc = 0
            for b in e_bits:
                e_enc = 2 * e_enc + b
            is_subnormal = 1 if (e_enc - bias) == -bias else 0
            for f_bits in product(*[[0, 1]] * num_fraction_bits):
                f_enc = 0
                for b in f_bits:
                    f_enc = 2 * f_enc + b
                f_frac = f_enc * 2.0 ** -num_fraction_bits
                f_eff = f_frac + 1 - is_subnormal
                all_values.append(sign * 2.0 ** (e_enc - bias + is_subnormal) * f_eff)
    return np.sort(np.array(all_values))


def generate_all_float_values_scaled(num_total_bits: int, num_exp_bits: int,
                                     exp_bias: int, range_limit_fp: float) -> np.ndarray:
    """FP grid rescaled so its absmax equals ``range_limit_fp``.

    Reference: fp8_quantizer.py:44-50.
    """
    grid = generate_all_values_fp(num_total_bits, num_exp_bits, exp_bias)
    float_max_abs_val = np.max(np.abs(grid))
    return grid / (float_max_abs_val / range_limit_fp)


def get_max_value(num_exponent_bits: int = 4, bias: int = 8) -> float:
    """Largest representable magnitude of an 8-bit EmMn format.

    Reference: fp8_quantizer.py:82-88.
    """
    num_fraction_bits = 7 - num_exponent_bits
    max_frac = 1.0 - 2.0 ** -num_fraction_bits
    return 2.0 ** (2 ** num_exponent_bits - 1 - bias) * (1.0 + max_frac)


def default_fp8_maxval(mantissa_bits: int, n_bits: int = 8) -> float:
    """Default signed maxval ``(2 - 2^-M) * 2^(2^E - 1 - default_bias)``.

    Reference: fp8_quantizer.py:173-179 (default_bias = 2^(E-1)).
    """
    ebits = n_bits - mantissa_bits - 1
    default_bias = 2 ** (ebits - 1)
    return (2.0 - 2.0 ** -mantissa_bits) * 2.0 ** (2 ** ebits - 1 - default_bias)


def _floor_log2_exact(y: jax.Array) -> jax.Array:
    """floor(log2(y)) for positive finite y via IEEE-754 exponent extraction.

    One bitcast + shift/mask on the VPU instead of a polynomial log2 —
    faster AND exact (the transcendental log2 can mis-select the bin within
    ~1 ulp of a power of two).  Subnormals and 0 map to -127, which the
    caller's clamp-at-1 turns into the smallest scale (the value then rounds
    to 0, same as the reference's log2(0) = -inf path).
    """
    bits = jax.lax.bitcast_convert_type(y, jnp.int32)
    return (((bits >> 23) & 0xFF) - 127).astype(jnp.float32)


def _exp2_int_exact(k: jax.Array) -> jax.Array:
    """2**k for integer-valued float k in [-126, 127], exactly, via bitcast."""
    ki = jnp.clip(k, -126.0, 127.0).astype(jnp.int32)
    return jax.lax.bitcast_convert_type((ki + 127) << 23, jnp.float32)


def quantize_to_fp8(x: jax.Array, maxval: jax.Array, mantissa_bits: jax.Array,
                    n_bits: int = 8, sign_bits: int = 1,
                    discretizer=round_ste, normalized: bool = False,
                    impl: str = "bitcast") -> jax.Array:
    """Fake-quantize ``x`` onto the FP8 grid defined by (maxval, mantissa_bits).

    ``maxval`` must broadcast against ``x`` (scalar for per-tensor, or shaped
    e.g. ``(1, 1, 1, O)`` for per-channel over an HWIO kernel — the caller owns
    the channel-axis convention).  ``mantissa_bits`` is a float scalar; it is
    STE-rounded and clamped to ``[1, n_bits - sign_bits]`` every call so it can
    be learned (reference: fp8_quantizer.py:105).  ``sign_bits`` may be a
    Python int or a traced 0/1 scalar (signedness is decided from data during
    calibration, which runs under jit).

    Exact port of the reference numerics (fp8_quantizer.py:91-133):
      bias       = 2^E - log2(maxval) + log2(2 - 2^-M) - 1
      xc         = clip(x, minval, maxval)
      log_scales = clamp(floor(log2|xc| + bias).detach(), min=1)
      scales     = 2^(log_scales - M - bias)
      out        = round_ste(xc / scales) * scales
    """
    sign_bits_f = jnp.asarray(sign_bits, jnp.float32)
    M = jnp.clip(round_ste(mantissa_bits), 1.0, float(n_bits) - sign_bits_f)
    E = float(n_bits) - sign_bits_f - M

    two_pow_E = 2.0 ** E
    grid_top = 2.0 - 2.0 ** (-M)        # largest significand, 1.111...1
    bias = two_pow_E - jnp.log2(maxval) + jnp.log2(grid_top) - 1.0

    minval = jnp.where(sign_bits_f > 0, -maxval, jnp.zeros_like(maxval))
    xc = jnp.minimum(jnp.maximum(x, minval), maxval)

    # floor(log2|xc|) term is detached (STE w.r.t. the input), clamp min at 1.0
    # keeps the subnormal range on the grid (reference note at :115-128).
    if impl == "bitcast":
        # floor(log2|xc| + bias) == floor(log2(|xc| * 2^frac(bias))) + floor(bias):
        # fold the fractional part of the (per-channel) bias into one multiply,
        # then read the exponent field directly — no per-element transcendentals.
        bias_int = jnp.floor(bias)
        bias_frac_pow2 = jnp.exp2(bias - bias_int)
        y = jnp.abs(xc) * bias_frac_pow2
        log_scales = jnp.clip(
            jax.lax.stop_gradient(_floor_log2_exact(y) + bias_int), 1.0, None)
    else:
        log_scales = jnp.clip(
            jax.lax.stop_gradient(jnp.floor(jnp.log2(jnp.abs(xc)) + bias)),
            1.0, None)

    # The reference computes scales = 2^(log_scales - M - bias) directly
    # (fp8_quantizer.py:130).  We substitute the definition of bias so the
    # exponent is integer-valued and the fractional part becomes the exact
    # factor maxval / (2 - 2^-M):
    #     2^(k - M - bias) = 2^(k - M - 2^E + 1) * maxval / (2 - 2^-M)
    # This keeps inaccurate transcendentals (XLA's fast log2/exp2) confined to
    # bin *selection* inside the floor — scale *values* are accurate to ~1 ulp
    # instead of ~1e-4, and gradients w.r.t. maxval / mantissa_bits are
    # algebraically identical to the reference formulation.
    if impl == "bitcast":
        # exact power-of-two construction via the exponent field.  The traced
        # factor exp2(g - g_det) is 1.0 exactly in value but carries the
        # d/dM gradient of the exponent (log_scales is detached either way),
        # so learn_mantissa_bits works identically to the log2 formulation.
        g = -M - two_pow_E + 1.0
        g_det = jax.lax.stop_gradient(g)
        pow2 = jax.lax.stop_gradient(_exp2_int_exact(log_scales + g_det)) \
            * jnp.exp2(g - g_det)
    else:
        pow2 = 2.0 ** (log_scales - M - two_pow_E + 1.0)
    scales = pow2 * (maxval / grid_top)

    m = discretizer(xc / scales)
    if normalized:
        # value on the *pure binary* FP8 grid: an (M+1)-bit significand times
        # a power of two — EXACT in bfloat16.  The caller re-applies the
        # channel factor maxval/(2 - 2^-M) after the matmul; this is what
        # lets the MXU run at bf16 rate with zero added quantization error.
        return m * pow2
    return m * scales


_IEEE_F8_DTYPES = {2: "float8_e5m2", 3: "float8_e4m3", 4: "float8_e3m4"}


def fp8_cast_dtype(mantissa_bits: int):
    """IEEE-style 8-bit float dtype with M mantissa bits, or None.

    Only the IEEE variants (inf/nan at the top exponent code) have the same
    binade *structure* as the paper's grid; the 'fn' variants repurpose the
    top binade and would misalign the grid near maxval.
    """
    name = _IEEE_F8_DTYPES.get(int(mantissa_bits))
    return getattr(jnp, name) if name and hasattr(jnp, name) else None


def fp8_cast_consts(maxval: jax.Array, mantissa_bits, n_bits: int = 8,
                    sign_bits=1) -> dict | None:
    """Consts for the hardware-cast deployment fast path, or None if ineligible.

    The fast path evaluates the fixed-mode FP8 fake-quant in the *scaled*
    domain ``y = x / scale`` (``scale = maxval / finfo(f8).max``) as

        qc = cast_f32(cast_f8(clip(y, lo, hi)))       # one saturating cast
        qb = (y + magic) - magic                      # fixed-step RNE round
        q  = where(|y| < smallest_normal, qb, qc)

    — ~10 VPU ops/element instead of the ~26 of the exponent-bitcast
    normalized pipeline (fp8_quantize_prepared), because the XLA f32->f8
    convert performs the per-binade mantissa rounding in one vectorized op.

    BIT-EXACT vs the reference grid (fp8_quantizer.py:91-133 numerics), via
    three load-bearing details:
      * The DIVISION by ``scale`` (never a reciprocal multiply): ``scale``
        is ``factor / 2^k`` with ``factor`` the exact pipeline's divisor, so
        both quotients share a mantissa and round-half-to-even breaks grid-
        midpoint ties identically (a reciprocal multiply flips ~2% of
        values by one step).
      * The IEEE f8 dtype covers every binade except the region below its
        smallest normal (its top exponent code is spent on inf/nan, so it
        has one fewer binade and a 2x-coarser subnormal step than the
        paper's grid).
      * Below ``smallest_normal`` the paper's grid is UNIFORM with step
        ``h = smallest_normal * 2^-(M+1)`` (its last binade + subnormals
        share one step), so the classic magic-constant rounding
        ``(y + 1.5*2^23*h) - 1.5*2^23*h`` reproduces it exactly, RNE ties
        included.
    tests/test_cast_quant.py pins op-level and model-level equality.  Opt in
    via QuantizerSpec(cast_fastpath=True) / make_layer_config(
    deploy_cast_quant=True); the exact pipeline remains the default.

    Eligibility (checked on CONCRETE values — call eagerly, as
    nn/bake.prepare_inference does): n_bits == 8, signed, M in {2, 3, 4},
    and a jnp IEEE f8 dtype available.  Returns None under tracing.
    """
    if n_bits != 8:
        return None
    try:
        sb = int(jax.device_get(jnp.asarray(sign_bits)))
        mb = int(round(float(jax.device_get(jnp.asarray(mantissa_bits)))))
    except (jax.errors.ConcretizationTypeError, jax.errors.TracerArrayConversionError):
        return None
    if sb != 1:
        return None
    dtype = fp8_cast_dtype(mb)
    if dtype is None:
        return None
    fi = jnp.finfo(dtype)
    f8_max = float(fi.max)
    sn = float(fi.smallest_normal)
    h = sn * 2.0 ** -(mb + 1)            # uniform step of the bottom region
    maxval = jnp.asarray(maxval, jnp.float32)
    return {
        "cast_probe": jnp.zeros((), dtype),      # carries the static dtype
        "cast_scale": maxval / f8_max,           # == the factored 'factor'
        "cast_lo": jnp.asarray(-f8_max, jnp.float32),
        "cast_hi": jnp.asarray(f8_max, jnp.float32),
        "cast_sn": jnp.asarray(sn, jnp.float32),
        "cast_magic": jnp.asarray(1.5 * 2.0 ** 23 * h, jnp.float32),
    }


def fp8_quantize_cast(x: jax.Array, c: dict, *, normalized: bool = False,
                      store_f8: bool = False, ieee_subnorm: bool = False):
    """Fixed-mode FP8 fake-quant via one saturating hardware cast + a
    magic-constant subnormal fixup (bit-exact vs the reference grid).

    See :func:`fp8_cast_consts` for the numerics contract.  ``normalized``
    returns the scaled-domain value ``q = fake_quant(x) / cast_scale`` — a
    <= (M+1)-significand-bit value, exact in bfloat16 — with
    ``factor = cast_scale``; the full-scale value is ``norm * factor``.
    (Below ``smallest_normal`` the paper's grid is finer than the IEEE f8
    grid, so ``norm`` is NOT generally representable in the f8 dtype itself;
    it is always exact in bf16.)

    ``store_f8`` (deployment, requires ``normalized``): return the IEEE f8
    ARRAY itself — the saturating cast is the whole quantizer.  1 byte/elem
    in HBM (half of bf16), and XLA fuses the f8->bf16 upconvert into MXU and
    depthwise consumers alike (tools/probe_dw_fusion.py), so inter-layer
    activation traffic halves with zero extra materialization.  The ONE
    numerics change vs the exact grid: values below ``smallest_normal`` land
    on the IEEE subnormal grid, whose step is 2x the paper grid's bottom
    step (the magic-constant fixup's region) — |error| <= sn*2^-(M+1) *
    cast_scale, i.e. half a bottom-step of a <=1.6%-of-maxval region.
    Model-level delta pinned in tests/test_ptq_accuracy_delta.py.
    """
    dtype = c["cast_probe"].dtype
    y = jnp.clip(x / c["cast_scale"], c["cast_lo"], c["cast_hi"])
    if store_f8:
        assert normalized, "store_f8 is a normalized-storage mode"
        return y.astype(dtype)
    qc = y.astype(dtype).astype(jnp.float32)
    if ieee_subnorm:
        # ``ieee_subnorm`` (deployment): the saturating cast IS the whole
        # quantizer — same VALUES as store_f8 (the sub-smallest-normal
        # region coarsens to the IEEE subnormal grid) but stored bf16/f32.
        # Drops the magic add/sub + abs/compare/SELECT — the select is the
        # op tools/probe_dw_fusion.py measured breaking conv-into-conv
        # fusion nesting on MobileNetV2's depthwise chains.
        q = qc
    else:
        qb = (y + c["cast_magic"]) - c["cast_magic"]
        q = jnp.where(jnp.abs(y) < c["cast_sn"], qb, qc)
    if normalized:
        return q.astype(jnp.bfloat16)
    return q * c["cast_scale"]


def fp8_fixed_consts(maxval: jax.Array, mantissa_bits: jax.Array,
                     n_bits: int = 8, sign_bits=1) -> dict:
    """Precompute every maxval/M-derived scalar the fixed-mode quantizer needs.

    In ``mode='fixed'`` the quantizer state is frozen, yet
    :func:`quantize_to_fp8` re-derives ~20 scalar ops (log2/exp2/floor/pow)
    from ``maxval`` on every forward — across ~21 activation quantizers that
    left ~435 unfused f32[] scalar ops at the ENTRY of the compiled ResNet-18
    step (round-2 HLO forensics).  Deployment freezes them into buffers once
    (see nn/bake.prepare_inference); the per-step graph then runs
    :func:`fp8_quantize_prepared`, which is elementwise-only.

    Numerics: bit-identical to quantize_to_fp8 — same formulas, evaluated
    once instead of per step.
    """
    sign_bits_f = jnp.asarray(sign_bits, jnp.float32)
    M = jnp.clip(jnp.round(mantissa_bits), 1.0, float(n_bits) - sign_bits_f)
    E = float(n_bits) - sign_bits_f - M
    two_pow_E = 2.0 ** E
    grid_top = 2.0 - 2.0 ** (-M)
    bias = two_pow_E - jnp.log2(maxval) + jnp.log2(grid_top) - 1.0
    bias_int = jnp.floor(bias)
    return {
        "minval": jnp.where(sign_bits_f > 0, -maxval, jnp.zeros_like(maxval)),
        "maxval": jnp.asarray(maxval, jnp.float32),
        "bias_int": bias_int,
        "bias_frac_pow2": jnp.exp2(bias - bias_int),
        "g": -M - two_pow_E + 1.0,          # integer-valued exponent offset
        "factor": maxval / grid_top,        # normalized-grid channel factor
    }


def fp8_quantize_prepared(x: jax.Array, c: dict, *, normalized: bool = False,
                          discretizer=round_ste) -> jax.Array:
    """Fixed-mode FP8 fake-quant from precomputed consts — elementwise only.

    Bit-exact vs :func:`quantize_to_fp8` on the same state: the per-element
    pipeline (clip -> exponent-extract -> round -> rescale) is unchanged; the
    scalar derivations were hoisted into :func:`fp8_fixed_consts`.  Division
    by ``pow2`` becomes an exact multiply by ``2^-p``; the single float
    rounding (the divide by ``factor``-scaled scales) lands in the same place.
    """
    xc = jnp.minimum(jnp.maximum(x, c["minval"]), c["maxval"])
    y = jnp.abs(xc) * c["bias_frac_pow2"]
    log_scales = jnp.clip(
        jax.lax.stop_gradient(_floor_log2_exact(y) + c["bias_int"]), 1.0, None)
    p = jax.lax.stop_gradient(log_scales + c["g"])
    pow2 = _exp2_int_exact(p)
    m = discretizer(xc * _exp2_int_exact(-p) / c["factor"])
    if normalized:
        return m * pow2
    return m * (pow2 * c["factor"])


def fp8_set_quant_range(x_min: jax.Array, x_max: jax.Array, *,
                        allow_unsigned: bool = False):
    """Derive (maxval, sign_bits) from an estimated range.

    Returns ``maxval = |max(|x_min|, x_max)|`` and ``sign_bits`` (a traced 0/1
    int32 scalar: 0 iff ``allow_unsigned`` and the whole range is
    non-negative).  jit-safe: signedness stays a traced value.
    Reference: fp8_quantizer.py:216-240 (set_quant_range/_make_unsigned).
    """
    x_min = jnp.asarray(x_min, jnp.float32)
    x_max = jnp.asarray(x_max, jnp.float32)
    maxval = jnp.abs(jnp.maximum(jnp.abs(x_min), x_max))
    if allow_unsigned:
        sign_bits = jnp.where(jnp.all(x_min >= 0), 0, 1).astype(jnp.int32)
    else:
        sign_bits = jnp.asarray(1, jnp.int32)
    return maxval, sign_bits
