"""Bit-level parity against the ACTUAL reference implementation.

When the upstream PyTorch reference is present (mounted read-only at
/root/reference) and torch is importable, run its quantizers on CPU and
compare element-wise against our JAX ops.  This is the strongest evidence
that the TPU redesign preserves the paper's numerics (SURVEY.md §7
"bit-exactness vs the reference semantics").  Skipped cleanly when the
reference tree or torch is unavailable.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Import the reference's quantizer modules (torch CPU)."""
    import os

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not available")
    torch = pytest.importorskip("torch")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    # the reference's package __init__ pulls in timm (not installed here)
    # purely for activation-class whitelists — stub just those symbols
    import types

    if "timm" not in sys.modules:
        acts = types.ModuleType("timm.models.layers.activations")
        for name in ("Swish", "HardSwish", "HardSigmoid"):
            setattr(acts, name, type(name, (torch.nn.Module,), {}))
        acts_me = types.ModuleType("timm.models.layers.activations_me")
        for name in ("SwishMe", "HardSwishMe", "HardSigmoidMe"):
            setattr(acts_me, name, type(name, (torch.nn.Module,), {}))
        layers = types.ModuleType("timm.models.layers")
        layers.activations = acts
        layers.activations_me = acts_me
        models = types.ModuleType("timm.models")
        models.layers = layers
        timm = types.ModuleType("timm")
        timm.models = models
        sys.modules.update({
            "timm": timm, "timm.models": models,
            "timm.models.layers": layers,
            "timm.models.layers.activations": acts,
            "timm.models.layers.activations_me": acts_me,
        })

    from quantization.quantizers import fp8_quantizer  # noqa

    return {"torch": torch, "fp8": fp8_quantizer}


def test_fp8_grid_enumeration_matches(ref):
    from fp8_quantization_tpu.ops.fp8 import generate_all_values_fp

    for ebits, bias in ((5, 16), (4, 8), (3, 4), (2, 2)):
        ours = generate_all_values_fp(8, ebits, bias)
        theirs = np.sort(np.asarray(
            ref["fp8"].generate_all_values_fp(8, ebits, bias)))
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)


def test_get_max_value_matches(ref):
    from fp8_quantization_tpu.ops.fp8 import get_max_value

    for ebits, bias in ((5, 16), (4, 8), (3, 4), (2, 2)):
        assert get_max_value(ebits, bias) == ref["fp8"].get_max_value(ebits, bias)


@pytest.mark.parametrize("mbits", [2, 3, 4, 5])
@pytest.mark.parametrize("per_channel", [False, True])
def test_quantize_to_fp8_elementwise_parity(ref, mbits, per_channel):
    """Our quantize_to_fp8 vs the reference quantize_to_fp8_ste_MM, same
    inputs, same maxval: element-wise agreement to fp32 round-off."""
    torch = ref["torch"]
    rng = np.random.RandomState(42 + mbits)
    x = rng.normal(0, 2.0, (64, 32)).astype(np.float32)

    if per_channel:
        maxval = np.abs(rng.normal(3, 1, (1, 32))).astype(np.float32)
    else:
        maxval = np.asarray([3.7], np.float32)  # reference needs >=1-d

    t_out = ref["fp8"].quantize_to_fp8_ste_MM(
        torch.from_numpy(x), 8, torch.from_numpy(np.asarray(maxval)),
        torch.tensor(float(mbits)), 1).numpy()

    from fp8_quantization_tpu.ops.fp8 import quantize_to_fp8

    for impl in ("bitcast", "log2"):
        j_out = np.asarray(quantize_to_fp8(
            jnp.asarray(x), jnp.asarray(maxval), jnp.asarray(float(mbits)),
            n_bits=8, sign_bits=1, impl=impl))
        np.testing.assert_allclose(j_out, t_out, rtol=2e-6, atol=2e-7,
                                   err_msg=f"impl={impl}")


def test_quantize_to_fp8_subnormal_and_clip_regions(ref):
    """Exercise the log_scales clamp (subnormals) and the clip boundaries."""
    torch = ref["torch"]
    mbits, maxval = 4.0, 1.0
    x = np.concatenate([
        np.linspace(-2, 2, 4001),                 # spans clipping at ±1
        np.geomspace(1e-6, 1e-1, 500),            # subnormal grid region
        -np.geomspace(1e-6, 1e-1, 500),
        [0.0, 1e-30, -1e-30],
    ]).astype(np.float32)

    t_out = ref["fp8"].quantize_to_fp8_ste_MM(
        torch.from_numpy(x), 8, torch.tensor([maxval]), torch.tensor(mbits),
        1).numpy()

    from fp8_quantization_tpu.ops.fp8 import quantize_to_fp8

    j_out = np.asarray(quantize_to_fp8(
        jnp.asarray(x), jnp.asarray(maxval), jnp.asarray(mbits)))
    np.testing.assert_allclose(j_out, t_out, rtol=2e-6, atol=1e-9)


@pytest.mark.parametrize("signed", [True, False])
def test_symmetric_uniform_parity(ref, signed):
    torch = ref["torch"]
    from quantization.quantizers.uniform_quantizers import (
        SymmetricUniformQuantizer)

    rng = np.random.RandomState(7)
    x = rng.normal(0, 1, (256,)).astype(np.float32)
    if not signed:
        x = np.abs(x)

    q = SymmetricUniformQuantizer(n_bits=8)
    x_min = np.float32(x.min() if signed else 0.0)
    x_max = np.float32(x.max())
    q.set_quant_range(torch.tensor(x_min), torch.tensor(x_max))
    t_out = q(torch.from_numpy(x)).detach().numpy()

    from fp8_quantization_tpu.ops import quantizer as oq
    from fp8_quantization_tpu.ops.quantizer import QMethod, QuantizerSpec

    spec = QuantizerSpec(method=QMethod.symmetric_uniform, n_bits=8)
    state = oq.set_quant_range(spec, oq.init_state(spec), x_min, x_max)
    j_out = np.asarray(oq.apply(spec, state, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, rtol=1e-6, atol=1e-7)


def test_asymmetric_uniform_parity(ref):
    torch = ref["torch"]
    from quantization.quantizers.uniform_quantizers import (
        AsymmetricUniformQuantizer)

    rng = np.random.RandomState(8)
    x = (rng.normal(0.5, 1, (256,))).astype(np.float32)
    q = AsymmetricUniformQuantizer(n_bits=8)
    q.set_quant_range(torch.tensor(np.float32(x.min())),
                      torch.tensor(np.float32(x.max())))
    t_out = q(torch.from_numpy(x)).detach().numpy()

    from fp8_quantization_tpu.ops import quantizer as oq
    from fp8_quantization_tpu.ops.quantizer import QMethod, QuantizerSpec

    spec = QuantizerSpec(method=QMethod.asymmetric_uniform, n_bits=8)
    state = oq.set_quant_range(spec, oq.init_state(spec),
                               np.float32(x.min()), np.float32(x.max()))
    j_out = np.asarray(oq.apply(spec, state, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, rtol=1e-6, atol=1e-7)


def test_fp8_mse_estimator_choice_parity(ref):
    """FP_MSE_Estimator end to end on one tensor: same best maxval/mantissa
    choice as our MSE fold."""
    torch = ref["torch"]
    from quantization.range_estimators import FP_MSE_Estimator
    from quantization.quantizers.fp8_quantizer import FPQuantizer

    rng = np.random.RandomState(3)
    w = rng.normal(0, 0.5, (16, 64)).astype(np.float32)  # (C, N) view

    tq = FPQuantizer(8, per_channel=True, mantissa_bits=4, set_maxval=True,
                     mse_include_mantissa_bits=True)
    est = FP_MSE_Estimator(per_channel=True, quantizer=tq)
    t_range = est(torch.from_numpy(w))
    t_mbits = float(tq.mantissa_bits)

    from fp8_quantization_tpu.calibration import estimators as jest
    from fp8_quantization_tpu.ops.quantizer import QMethod, QuantizerSpec

    spec = QuantizerSpec(method=QMethod.fp_quantizer, per_channel=True,
                         set_maxval=True, mse_include_mantissa_bits=True)
    espec = jest.EstimatorSpec(kind=jest.RangeEstimators.MSE)
    state = jest.init_state(espec, spec, 16)
    _, x_min, x_max, q_updates = jest.update(espec, spec, state,
                                             jnp.asarray(w))
    np.testing.assert_allclose(float(q_updates["mantissa_bits"]), t_mbits)
    np.testing.assert_allclose(np.asarray(x_max),
                               t_range[1].detach().numpy().reshape(-1),
                               rtol=1e-5, atol=1e-6)


def test_analytical_expected_mse_parity(ref):
    """Closed-form expected rounding MSE: ours vs the reference's
    estimate_rounding_error_analyt on identical grids/distributions."""
    from quantization.quant_error_estimator import estimate_rounding_error_analyt
    from utils.distributions import ClippedGaussDistr, ClippedStudentTDistr

    from fp8_quantization_tpu.analytical.distributions import (
        ClippedGaussian, ClippedStudentT)
    from fp8_quantization_tpu.analytical.quant_error import (
        expected_rounding_error)
    from fp8_quantization_tpu.ops.fp8 import generate_all_float_values_scaled

    grid = generate_all_float_values_scaled(8, 4, 8, 3.0)

    t_g = ClippedGaussDistr(params_dict={"mu": 0.0, "sigma": 1.0},
                            range_min=-10.0, range_max=10.0)
    j_g = ClippedGaussian(mu=0.0, sigma=1.0, range_min=-10.0, range_max=10.0)
    np.testing.assert_allclose(expected_rounding_error(j_g, grid),
                               estimate_rounding_error_analyt(t_g, grid),
                               rtol=1e-6)

    t_t = ClippedStudentTDistr(params_dict={"nu": 8.0}, range_min=-100.0,
                               range_max=100.0)
    j_t = ClippedStudentT(nu=8.0, range_min=-100.0, range_max=100.0)
    np.testing.assert_allclose(expected_rounding_error(j_t, grid),
                               estimate_rounding_error_analyt(t_t, grid),
                               rtol=1e-5)


def test_percentile_estimator_parity(ref):
    """CurrentMinMaxEstimator with percentile clipping vs ours."""
    torch = ref["torch"]
    from quantization.range_estimators import CurrentMinMaxEstimator

    rng = np.random.RandomState(11)
    x = rng.normal(0, 1, (1, 4096)).astype(np.float32)

    est = CurrentMinMaxEstimator(percentile=1.0, per_channel=False)
    t_min, t_max = est(torch.from_numpy(x))

    from fp8_quantization_tpu.calibration import estimators as jest
    from fp8_quantization_tpu.ops.quantizer import QMethod, QuantizerSpec

    spec = QuantizerSpec(method=QMethod.fp_quantizer)
    espec = jest.EstimatorSpec(kind=jest.RangeEstimators.current_minmax,
                               percentile=1.0)
    state = jest.init_state(espec, spec, None)
    _, j_min, j_max, _ = jest.update(espec, spec, state, jnp.asarray(x))
    np.testing.assert_allclose(float(j_min), float(t_min), rtol=2e-3)
    np.testing.assert_allclose(float(j_max), float(t_max), rtol=2e-3)


def test_line_search_per_channel_parity(ref):
    """Per-channel 1-D line search vs the reference's LineSearchEstimator
    with per_channel=True (_perform_1D_search + per_channel_loss,
    range_estimators.py:161-168,236-256), losses accumulated over 2 batches."""
    torch = ref["torch"]
    from quantization.range_estimators import LineSearchEstimator
    from quantization.quantizers.fp8_quantizer import FPQuantizer

    rng = np.random.RandomState(7)
    batches = [rng.normal(0, s, (6, 256)).astype(np.float32)
               for s in (0.5, 0.8)]                       # (C, N) views

    tq = FPQuantizer(8, mantissa_bits=4, set_maxval=True)
    est = LineSearchEstimator(per_channel=True, quantizer=tq,
                              num_candidates=120)
    for b in batches:
        t_min, t_max = est(torch.from_numpy(b))

    from fp8_quantization_tpu.calibration import estimators as jest
    from fp8_quantization_tpu.ops.quantizer import QMethod, QuantizerSpec

    spec = QuantizerSpec(method=QMethod.fp_quantizer, per_channel=True,
                         set_maxval=True)
    espec = jest.EstimatorSpec(kind=jest.RangeEstimators.line_search,
                               num_candidates=120)
    state = jest.init_state(espec, spec, 6)
    for b in batches:
        state, j_min, j_max, _ = jest.update(espec, spec, state,
                                             jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(j_max),
                               t_max.detach().numpy().reshape(-1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(j_min),
                               t_min.detach().numpy().reshape(-1),
                               rtol=1e-5, atol=1e-6)
